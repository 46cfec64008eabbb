"""Full-page math detection + recognition demo.

Parity target: reference Streamlit demo (``demo/app.py:44-334``): upload an
image/PDF page, resize to width 1280, detect math regions (SSD sliding
windows + NMS), expand + crop each region, recognize each crop to LaTeX,
render back.

Runs as a CLI (``python demo/app.py page.png``) always; the Streamlit UI
activates when streamlit is installed (``streamlit run demo/app.py``).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from doc2tex_tpu.detection.flow import MathDetector
from doc2tex_tpu.recognition import MathRecognition

PAGE_WIDTH = 1280  # reference demo/app.py:68-84


def detect_preprocess(page: np.ndarray) -> tuple[np.ndarray, float]:
    """Resize page to width 1280 (reference demo/app.py:68-84)."""
    from PIL import Image

    h, w = page.shape[:2]
    scale = PAGE_WIDTH / w
    new_h = int(round(h * scale))
    img = Image.fromarray(page).resize((PAGE_WIDTH, new_h), Image.LANCZOS)
    return np.asarray(img, np.uint8), scale


class App:
    """page -> [(box, latex), ...] (reference App.__call__ demo/app.py:182)."""

    def __init__(
        self,
        recog_config=None,
        recog_weights=None,
        detect_weights=None,
        use_detect: bool = True,
        conf_thresh: float = 0.5,
        nms_iou: float = 0.1,
        expand_frac: float = 0.05,
        stitch: bool = False,
        stitch_votes: float = 8,
        recognizer=None,
        detect_mesh=None,
        detect_quantize=None,
    ):
        self.use_detect = use_detect
        # stitch=True replaces page-level NMS with the voting stitch the
        # reference uses for full-PDF processing (gtdb/stitch_patches_pdf)
        self.stitch = stitch
        self.stitch_votes = stitch_votes
        if use_detect:
            # detect_weights: a checkpoint path (str), a variables pytree,
            # or None -> the in-repo released detector weights when present
            if detect_weights is None:
                shipped = os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "saved_models", "math_detect", "best_weights.msgpack",
                )
                detect_weights = shipped if os.path.exists(shipped) else None
            det_kw = dict(
                conf_thresh=conf_thresh, iou_thresh=nms_iou,
                expand_frac=expand_frac, mesh=detect_mesh,
                quantize=detect_quantize,
            )
            if isinstance(detect_weights, str):
                self.detector = MathDetector(weights_path=detect_weights,
                                             **det_kw)
            else:
                self.detector = MathDetector(variables=detect_weights,
                                             **det_kw)
        else:
            self.detector = None
        # recognizer: share an existing MathRecognition (e.g. the one a
        # serving front already built) instead of loading a second copy
        self.recognizer = (
            recognizer
            if recognizer is not None
            else MathRecognition(config=recog_config, weights_path=recog_weights)
        )

    def __call__(self, page: np.ndarray):
        if not self.use_detect:
            latex = self.recognizer(page)
            h, w = page.shape[:2]
            return [((0, 0, w, h), latex)]
        boxes, crops = self.detect_and_crop(page)
        latexes = self.recognizer(crops) if crops else []
        return list(zip(boxes, latexes))

    def detect_and_crop(self, page: np.ndarray):
        """Detection half of the pipeline: page -> aligned
        ``([original-scale boxes], [crop images])``.  Split out so a
        serving front (:class:`doc2tex_tpu.serving.PageServer`) can route
        the crops through a shared micro-batching recognizer while the
        next page's detection proceeds."""
        if not self.use_detect:
            h, w = page.shape[:2]
            return [(0, 0, w, h)], [page]
        resized, scale = detect_preprocess(page)
        if self.stitch:
            from doc2tex_tpu.detection.stitch import stitch_page

            raw_boxes, raw_scores = self.detector.detect_page(
                resized, raw=True  # no NMS/top-k cap; stitch dedups by voting
            )
            bs = (
                np.concatenate([raw_boxes, raw_scores[:, None]], axis=1)
                if len(raw_boxes)
                else np.zeros((0, 5), np.float32)
            )
            boxes = np.asarray(
                stitch_page(
                    bs, resized.shape[:2], page_image=resized,
                    thresh_votes=self.stitch_votes,
                ),
                np.float32,
            ).reshape(-1, 4)
            scores = np.ones(len(boxes), np.float32)
        else:
            boxes, scores = self.detector.detect_page(resized)
        crops = self.detector.crop_regions(resized, boxes)
        # filter boxes and crops TOGETHER — dropping only empty crops would
        # misalign every subsequent (box, latex) pair
        kept = [(b, c) for b, c in zip(boxes, crops) if c.size > 0]
        if not kept:
            return [], []
        out_boxes = [
            tuple(int(round(v / scale)) for v in b) for b, _ in kept
        ]
        return out_boxes, [c for _, c in kept]


def _cli() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("image", help="page image (png/jpg)")
    p.add_argument("--recog_config", default=None,
                   help="recognizer yaml; defaults to demo/recog_cfg.yaml "
                   "(the shipped decode contract: beam 10, pad True)")
    p.add_argument("--model_version", default="version2",
                   help="version block of recog_cfg.yaml to use")
    p.add_argument("--recog_weights", default=None)
    p.add_argument("--detect_weights", default=None,
                   help="SSD checkpoint; defaults to the in-repo released "
                   "saved_models/math_detect weights when present")
    p.add_argument("--no_detect", action="store_true")
    p.add_argument(
        "--stitch", action="store_true",
        help="voting-stitch page regions instead of NMS (reference "
        "full-PDF path, gtdb/stitch_patches_pdf.py)",
    )
    p.add_argument("--stitch_votes", type=float, default=8)
    args = p.parse_args()

    from PIL import Image

    from doc2tex_tpu.recognition import load_recog_config

    # reference demo contract (demo/recog_cfg.yaml): common block merged
    # with the selected version block; flat yamls pass through unchanged
    cfg, cfg_weights = load_recog_config(
        args.recog_config, version=args.model_version
    )
    if args.recog_weights is None:
        args.recog_weights = cfg_weights
    if args.image.lower().endswith(".pdf"):
        # PDF page input (reference demo supports pdf2image uploads)
        try:
            from pdf2image import convert_from_path

            pages = convert_from_path(args.image, first_page=1, last_page=1)
            page = np.asarray(pages[0].convert("L"), np.uint8)
        except ImportError:
            raise SystemExit("PDF input needs the pdf2image package")
    else:
        page = np.asarray(Image.open(args.image).convert("L"), np.uint8)
    app = App(
        recog_config=cfg,
        recog_weights=args.recog_weights,
        detect_weights=args.detect_weights,
        use_detect=not args.no_detect,
        stitch=args.stitch,
        stitch_votes=args.stitch_votes,
    )
    for box, latex in app(page):
        print(f"{box}\t{latex}")


def _streamlit() -> None:  # pragma: no cover - UI
    import streamlit as st
    from PIL import Image

    st.set_page_config(page_title="doc2tex-tpu demo", layout="wide")
    st.title("Math detection + recognition (TPU)")
    uploaded = st.file_uploader("Page image", type=["png", "jpg", "jpeg"])
    use_detect = st.checkbox("Detect regions", value=True)
    if uploaded is not None:
        page = np.asarray(Image.open(uploaded).convert("L"), np.uint8)
        st.image(page, caption="input", use_column_width=True)

        @st.cache_resource
        def _app(use_detect: bool):
            return App(use_detect=use_detect)

        results = _app(use_detect)(page)
        for box, latex in results:
            st.latex(latex or r"\text{(empty)}")
            st.caption(f"box: {box}")


if __name__ == "__main__":
    _cli()
else:
    try:  # streamlit executes the module top-level
        import streamlit  # noqa: F401

        if streamlit.runtime.exists():
            _streamlit()
    except Exception:
        pass
