"""Per-crop math recognition flow (the demo recognizer).

Parity target: reference ``MathRecognition``
(``demo/HybridViT/recog_flow.py:17-128``): vocab prep, checkpoint load,
preprocess/resize, greedy decode, '[s]' cut, whitespace + hspace/vspace
postprocess.

TPU-native: crops are grouped into the bucket ladder and decoded in
batches with the jitted decode runner (the reference decodes one crop at a
time); decode fns are cached per (bucket, batch) shape.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np

from ..config import make_config
from ..data.buckets import make_ladder, pad_to_bucket
from ..decode.runner import make_decode_fn
from ..models import build_model
from ..tokenizer.converters import create_converter
from ..train.checkpoint import load_pretrained_variables
from ..train.trainer import init_model
from ..transforms.preprocess import resize_for_inference


def postprocess_prediction(s: str) -> str:
    """Whitespace removal + hspace/vspace argument collapsing
    (reference ``recog_flow.py:84-105``)."""
    from ..latex.postprocess import Postprocessing

    s = Postprocessing.remove_unused_whitespace(s)
    for space in ("hspace", "vspace"):
        out, last = "", 0
        for m in re.finditer(space + r" ?{(.*?)}", s):
            out += s[last : m.start(1)] + m.group(1).replace(" ", "")
            last = m.end(1)
        s = out + s[last:]
    return s


DEFAULT_RECOG_CFG = "demo/recog_cfg.yaml"


def coalesce_groups(
    groups: dict, ratio: float
) -> dict:
    """Merge per-bucket index groups into CONTAINING buckets (serving
    bucket coalescing).

    Decode-invocation cost is nearly flat in batch size (320/442/536 ms at
    batch 1/16/64 — BASELINE.md), so mixed sparse traffic that fragments
    into one invocation per bucket is what caps serving throughput.
    Padding a crop up to a containing bucket (white, top-left — exactly
    the train-time ``pad_to_bucket``) merges those invocations.

    Greedy, largest-first: each group joins the first already-kept target
    whose bucket contains it elementwise AND whose area is <= ``ratio`` x
    the group's native bucket area (the guard keeps a tiny formula out of
    a mostly-white display bucket — off-distribution; the EM gate for the
    shipped ratio is ``tools/coalesce_eval.py``).  Only buckets already
    present are used as targets, so no new (larger) program shapes are
    introduced.  ``ratio <= 1`` is the identity.
    """
    if ratio <= 1.0 or len(groups) < 2:
        return groups
    order = sorted(groups, key=lambda b: (b[0] * b[1], b), reverse=True)
    merged: dict = {}
    for b in order:
        area = b[0] * b[1]
        # among kept targets that contain b and pass the ratio guard,
        # merge into the TIGHTEST (smallest-area) one — the largest
        # qualifying bucket maximizes white padding, the known
        # EM-costing off-distribution case (ADVICE r4)
        cands = [
            t for t in merged
            if t[0] >= b[0] and t[1] >= b[1] and t[0] * t[1] <= ratio * area
        ]
        if cands:
            t = min(cands, key=lambda t: (t[0] * t[1], t))
            merged[t].extend(groups[b])
        else:
            merged[b] = list(groups[b])
    return merged


def _snap_batch(n: int, cap: int = 64) -> int:
    """Snap the batch axis to {1, 8, cap, 2*cap, ...}.

    Decode-invocation wall time is nearly FLAT in batch size (the loop is
    latency-bound: 320/442/536 ms warm at batch 1/16/64 on v5e-1), so
    padding rows cost ~nothing — but every distinct (bucket, batch) pair
    costs an in-process trace (~0.5-1 s) plus a compile/deserialize on
    first sight.  A coarse 3-point ladder keeps the program set small so
    serving reaches steady state quickly; the old power-of-two ladder
    made 7 shapes per bucket and traced its way through most of them."""
    if n >= cap:
        return -(-n // cap) * cap
    return 1 if n == 1 else 8 if n <= 8 else cap


def load_recog_config(
    path: Optional[str] = None, version: str = "version2"
) -> tuple[dict, Optional[str]]:
    """Load the demo recognizer config contract: ``(config, weights_path)``.

    Parity: reference ``demo/recog_cfg.yaml:1-59`` — a ``common`` block
    (arch + decode contract: beam 10, pad True) merged with a per-release
    ``versionN`` block (size regime, vocab, weights).  A flat yaml (no
    ``common`` key) skips the version merge but gets the same path
    handling.  Relative vocab/weight paths resolve against the repo
    root; a missing weights file degrades to random init with a warning.
    """
    import logging
    import os

    import yaml

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if path is None:
        path = os.path.join(root, DEFAULT_RECOG_CFG)
    with open(path) as f:
        raw = yaml.safe_load(f)
    if "common" not in raw:
        merged = dict(raw)
    else:
        if version not in raw:
            raise KeyError(
                f"unknown model version {version!r}; have "
                f"{sorted(k for k in raw if k != 'common')}"
            )
        merged = dict(raw["common"])
        merged.update(raw[version])
    vocab = merged.get("vocab")
    if vocab and not os.path.isabs(vocab):
        merged["vocab"] = os.path.join(root, vocab)
    weights = merged.pop("weight_path", None)
    if weights and not os.path.isabs(weights):
        weights = os.path.join(root, weights)
    if weights and not os.path.exists(weights):
        logging.getLogger(__name__).warning(
            "recog weights %s not found; using random init", weights
        )
        weights = None
    return make_config(merged), weights


class MathRecognition:
    """Crop images -> LaTeX strings."""

    def __init__(
        self,
        config=None,
        weights_path: Optional[str] = None,
        beam_size: Optional[int] = None,
        seed: int = 0,
        use_clahe: Optional[bool] = None,
        mesh=None,
        coalesce_ratio: Optional[float] = None,
    ):
        """``mesh`` (a ``jax.sharding.Mesh``): decode every bucket batch
        sharded over the mesh's ``data`` axis — multi-chip serving.  The
        batch ladder is rounded up to the data-axis size so the sharded
        program always divides evenly; padding rows replicate row 0 and
        are trimmed, so outputs are token-identical to single-device
        decode (``tests/test_parallel.py::TestShardedInference::
        test_recognition_flow_over_mesh``).  The serving front
        (:class:`~doc2tex_tpu.serving.RecognitionServer`) inherits this
        transparently — it only sees the batch callable."""
        self.config = config if config is not None else make_config(
            {"synthetic_data": 1}
        )
        self.mesh = mesh
        # CLAHE is always-on in the reference demo recognizer's transform
        # (demo/HybridViT/helper.py:40-52); a model version trained without
        # it (e.g. the in-repo `synthetic` release) sets `clahe: False` in
        # its config block; the constructor arg overrides either way.
        if use_clahe is None:
            use_clahe = bool(self.config.get("clahe", True))
        self.use_clahe = use_clahe
        # opt-in int8 inference (ops/quant.py): `quantize: int8` in the
        # model version block quantizes the encoder (measured zero
        # exact-match cost on the `synthetic` release weights, +27% on the
        # headline bench — BASELINE.md); `quantize: int8_full` additionally
        # stores the decode attention memory int8 (halves decode-step HBM
        # reads).
        from ..ops.quant import parts_for_mode

        self.quant_parts = parts_for_mode(self.config.get("quantize"))
        # serving bucket coalescing (see coalesce_groups): merge sparse
        # bucket groups into containing buckets, bounded by this area
        # ratio.  0/1 = off.  Config key `coalesce_ratio`; constructor
        # arg overrides.
        self.coalesce_ratio = float(
            coalesce_ratio if coalesce_ratio is not None
            else self.config.get("coalesce_ratio", 0.0) or 0.0
        )
        self.converter = create_converter(self.config)
        self.config["num_class"] = self.converter.num_classes
        self.model = build_model(self.config, self.converter.num_classes)
        self.beam_size = (
            beam_size if beam_size is not None
            else int(self.config.get("beam_size", 1))
        )

        h0, w0 = self.config["min_dimension"]
        params, batch_stats = init_model(
            self.model, jax.random.PRNGKey(seed), (1, h0, w0, 1),
            self.config["batch_max_length"] + 1,
        )
        if weights_path:
            params, batch_stats, _ = load_pretrained_variables(
                weights_path, params, batch_stats
            )
        self.variables = {"params": params, "batch_stats": batch_stats}
        self.table = make_ladder(
            self.config["min_dimension"],
            self.config["max_dimension"],
            self.config.get("scale_factor", 32),
            growth=float(self.config.get("bucket_growth", 1.5)),
        )
        self._decode_cache: dict = {}

    def _decode_fn(self):
        key = self.beam_size
        if key not in self._decode_cache:
            self._decode_cache[key] = make_decode_fn(
                self.model, self.config, beam_size=self.beam_size,
                mesh=self.mesh,
            )
        return self._decode_cache[key]

    def bucket_key(self, image: np.ndarray):
        """The bucket this crop will decode in — pure shape arithmetic
        (mirrors ``resize_for_inference`` + the ladder lookup in
        ``__call__``), cheap enough to run per request at submit time.
        Lets a serving front (:class:`~doc2tex_tpu.serving
        .RecognitionServer` ``bucket_key=``) form shape-pure batches so a
        dispatcher batch is ONE decode invocation instead of one per
        bucket."""
        from ..transforms.preprocess import minmax_size

        h, w = image.shape[:2]
        cfg = self.config
        ds = cfg.get("downsample", 1) or 1
        if (
            ds > 1
            and h / ds >= cfg["min_dimension"][0]
            and w / ds >= cfg["min_dimension"][1]
        ):
            h, w = int(h / ds), int(w / ds)
        h, w = minmax_size(
            h, w, tuple(cfg["max_dimension"]), tuple(cfg["min_dimension"])
        )
        sf = cfg.get("scale_factor", 32)
        h, w = -(-h // sf) * sf, -(-w // sf) * sf
        bucket = self.table.lookup(h, w)
        return bucket if bucket is not None else self.table.shapes[-1]

    def _preprocess(self, image: np.ndarray) -> np.ndarray:
        if image.ndim == 3:
            image = np.round(
                image.astype(np.float32).mean(axis=-1)
            ).astype(np.uint8)
        if self.use_clahe:
            from ..transforms.preprocess import clahe

            image = clahe(image, clip_limit=2.0, grid=(2, 2))
        return resize_for_inference(image, self.config)

    def __call__(self, images) -> list[str]:
        """One crop or a list of crops -> LaTeX string(s)."""
        single = isinstance(images, np.ndarray)
        crops: Sequence[np.ndarray] = [images] if single else list(images)
        prepped = [self._preprocess(c) for c in crops]

        # group by bucket
        groups: dict[tuple[int, int], list[int]] = {}
        for i, img in enumerate(prepped):
            bucket = self.table.lookup(*img.shape[:2])
            if bucket is None:
                bucket = self.table.shapes[-1]
                prepped[i] = img[: bucket[0], : bucket[1]]
            groups.setdefault(bucket, []).append(i)
        groups = coalesce_groups(groups, self.coalesce_ratio)

        decode = self._decode_fn()
        results: list[str] = [""] * len(crops)
        token_level = self.config.get("token_level", "word")
        sep = " " if token_level == "word" else ""
        for bucket, idxs in groups.items():
            batch = np.stack(
                [pad_to_bucket(prepped[i], bucket) for i in idxs]
            )[..., None]
            # snap the batch axis to a power-of-two ladder so every
            # (bucket, batch) pair maps to a bounded program set — ragged
            # group sizes otherwise force a fresh XLA compile (~2-4 s over
            # the tunnel) per page; padding rows replicate row 0 and are
            # trimmed from the outputs
            n = batch.shape[0]
            padded_n = _snap_batch(n)
            if self.mesh is not None:
                # sharded decode: the batch axis splits over the data
                # axis, so every snapped size must divide evenly
                nd = int(self.mesh.shape["data"])
                padded_n = -(-padded_n // nd) * nd
            if padded_n != n:
                batch = np.concatenate(
                    [batch, np.repeat(batch[:1], padded_n - n, axis=0)]
                )
            if self.quant_parts:
                # trace-time context: first call per (bucket, batch) shape
                # traces through the int8 path; steady-state calls just
                # reuse the compiled program
                from ..ops.quant import quantized_inference

                with quantized_inference(parts=self.quant_parts):
                    tokens, _ = decode(self.variables, batch)
            else:
                tokens, _ = decode(self.variables, batch)
            for row, i in zip(np.asarray(tokens)[:n], idxs):
                toks = self.converter.detokenize(row[None])[0]
                results[i] = postprocess_prediction(sep.join(toks))
        return results[0] if single else results
