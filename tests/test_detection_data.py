"""GTDB detection data + SSD train step + DSL/recheck helper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from PIL import Image

from doc2tex_tpu.detection.data import (
    GTDBDetectionDataset,
    make_detection_train_step,
    read_pmath,
    window_targets,
)
from doc2tex_tpu.detection.windows import rolling_windows


class TestGTDBData:
    def test_read_pmath(self, tmp_path):
        p = tmp_path / "page.pmath"
        p.write_text("10,20,100,60\n200 300 400 350\n")
        boxes = read_pmath(str(p))
        assert boxes.shape == (2, 4)
        np.testing.assert_allclose(boxes[0], [10, 20, 100, 60])

    def test_window_targets(self):
        page = np.full((512, 1024), 255, np.uint8)
        _, info = rolling_windows(page)
        boxes = np.asarray([[10, 10, 200, 60]], np.float32)
        gt, valid = window_targets(boxes, info)
        # first window fully contains the box
        assert valid[0, 0]
        np.testing.assert_allclose(
            gt[0, 0], [10 / 512, 10 / 512, 200 / 512, 60 / 512], atol=1e-6
        )

    def test_dataset_and_train_step(self, tmp_path):
        img_dir = tmp_path / "imgs"
        anno_dir = tmp_path / "annos"
        img_dir.mkdir()
        anno_dir.mkdir()
        page = np.full((600, 700), 255, np.uint8)
        page[100:160, 50:400] = 0
        Image.fromarray(page).save(img_dir / "p1.png")
        (anno_dir / "p1.pmath").write_text("50,100,400,160\n")

        ds = GTDBDetectionDataset(str(img_dir), str(anno_dir))
        assert len(ds) > 0
        batches = list(ds.batches(batch_size=2))
        assert batches
        imgs, gt, valid = batches[0]
        assert imgs.shape[1:3] == (512, 512)
        assert valid.any()

        # tiny SSD train step on one batch (just checks the program runs)
        from doc2tex_tpu.detection import SSD512, make_priors

        model = SSD512(num_classes=2)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.float32)
        )
        priors = jnp.asarray(make_priors())
        tx = optax.sgd(1e-4)
        opt_state = tx.init(variables["params"])
        step = make_detection_train_step(model, priors, tx)
        params, opt_state, metrics = step(
            variables["params"], opt_state,
            jnp.asarray(imgs), jnp.asarray(gt), jnp.asarray(valid),
        )
        assert np.isfinite(float(metrics["loss"]))


class TestSelectionDSL:
    ROWS = [
        {"name": "a", "pred": "x + y", "label": "x + y", "iscorrect": 1},
        {"name": "b", "pred": "1 2 3 4 5 6", "label": "z", "iscorrect": 0},
        {"name": "c", "pred": "q", "label": "q", "iscorrect": 1},
    ]

    def test_len_and_correct_filter(self):
        from doc2tex_tpu.tools.interpretation import select_samples

        out = select_samples(self.ROWS, "(len < 5 & len > 1)%iscorrect: True")
        assert [r["name"] for r in out] == ["a"]

    def test_no_condition(self):
        from doc2tex_tpu.tools.interpretation import select_samples

        assert len(select_samples(self.ROWS)) == 3


class TestRecheck:
    def test_queue_and_fixes(self):
        from doc2tex_tpu.tools.vocab_tools import apply_recheck_fixes, recheck_queue

        rows = [("a", "x + y"), ("b", "x \\weird y")]
        q = recheck_queue(rows, ["x", "y", "+"])
        assert len(q) == 1 and q[0][0] == "b" and q[0][2] == ["\\weird"]
        fixed = apply_recheck_fixes(rows, {"b": "x + y", "a": ""})
        assert fixed == [("b", "x + y")]


class TestDetectionEval:
    def test_perfect_match(self):
        from doc2tex_tpu.detection.evaluate import evaluate_detections

        gt = np.asarray([[10, 10, 50, 30], [60, 60, 100, 90]], np.float32)
        preds = [(gt.copy(), np.asarray([0.9, 0.8]))]
        out = evaluate_detections(preds, [gt])
        assert out["f1@0.5"] == 1.0 and out["precision@0.75"] == 1.0

    def test_fp_fn(self):
        from doc2tex_tpu.detection.evaluate import evaluate_detections

        gt = np.asarray([[10, 10, 50, 30]], np.float32)
        preds = [(np.asarray([[200, 200, 250, 230]], np.float32),
                  np.asarray([0.9]))]
        out = evaluate_detections(preds, [gt])
        assert out["precision@0.5"] == 0.0 and out["recall@0.5"] == 0.0

    def test_partial_iou(self):
        from doc2tex_tpu.detection.evaluate import evaluate_detections

        gt = np.asarray([[0, 0, 100, 100]], np.float32)
        pred = np.asarray([[0, 0, 100, 60]], np.float32)  # IoU = 0.6
        out = evaluate_detections([(pred, np.asarray([0.9]))], [gt])
        assert out["recall@0.5"] == 1.0 and out["recall@0.75"] == 0.0


class TestStepTimer:
    def test_compile_isolated(self):
        from doc2tex_tpu.utils.profiling import StepTimer

        t = StepTimer()
        for _ in range(3):
            with t.step(("a",)):
                pass
        s = t.summary()["('a',)"]
        assert s["steps"] == 2 and "compile_s" in s


class TestSoakPageStyles:
    def test_mixed_style_pages_carry_real_renders(self):
        # round-4 detector fix: --style mixed pastes real formula renders
        import sys as _sys, os as _os
        _sys.path.insert(0, _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "tools"))
        import numpy as np
        from detection_soak import synth_page

        rng = np.random.default_rng(3)
        for style in ("bars", "mixed"):
            img, boxes = synth_page(rng, style=style)
            assert img.shape == (512, 512)
            assert img.dtype == np.uint8
            boxes = np.asarray(boxes).reshape(-1, 4)
            for x1, y1, x2, y2 in boxes:
                assert 0.0 <= x1 < x2 <= 1.0 and 0.0 <= y1 < y2 <= 1.0
                # the labelled region really contains ink
                px = img[int(y1 * 512):int(y2 * 512),
                         int(x1 * 512):int(x2 * 512)]
                assert (px < 200).any()
