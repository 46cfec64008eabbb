"""Math-detection stack tests (priors, SSD shapes, decode/NMS, windows, loss)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doc2tex_tpu.detection import (
    MATH_GTDB_512,
    SSD512,
    batched_detect,
    decode_boxes,
    make_priors,
    nms_fixed,
    rolling_windows,
    unmap_boxes,
)
from doc2tex_tpu.detection.loss import multibox_loss
from doc2tex_tpu.detection.windows import expand_boxes


class TestPriors:
    def test_count_matches_mbox(self):
        priors = make_priors()
        expected = sum(f * f * nb for f, nb in zip(
            MATH_GTDB_512["feature_maps"], MATH_GTDB_512["mbox"]
        ))
        assert priors.shape == (expected, 4)

    def test_clipped(self):
        priors = make_priors()
        assert priors.min() >= 0.0 and priors.max() <= 1.0


class TestSSDShapes:
    @pytest.fixture(scope="class")
    def model_vars(self):
        model = SSD512(num_classes=2)
        x = jnp.zeros((1, 512, 512, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        return model, variables

    def test_head_alignment_with_priors(self, model_vars):
        model, variables = model_vars
        x = jnp.zeros((2, 512, 512, 3), jnp.float32)
        loc, conf = model.apply(variables, x)
        n_priors = make_priors().shape[0]
        assert loc.shape == (2, n_priors, 4)
        assert conf.shape == (2, n_priors, 2)


class TestBoxes:
    def test_decode_identity(self):
        priors = jnp.asarray([[0.5, 0.5, 0.2, 0.2]])
        loc = jnp.zeros((1, 4))
        out = decode_boxes(loc, priors)
        np.testing.assert_allclose(np.asarray(out[0]), [0.4, 0.4, 0.6, 0.6], atol=1e-6)

    def test_nms_suppresses_overlaps(self):
        boxes = jnp.asarray([
            [0.1, 0.1, 0.5, 0.5],
            [0.12, 0.12, 0.5, 0.5],   # overlaps box 0
            [0.7, 0.7, 0.9, 0.9],     # separate
        ])
        scores = jnp.asarray([0.9, 0.8, 0.7])
        kb, ks = nms_fixed(boxes, scores, iou_thresh=0.1, top_k=3)
        ks = np.asarray(ks)
        assert (ks > 0).sum() == 2
        assert ks[0] == pytest.approx(0.9)

    def test_batched_detect_thresholds(self):
        priors = jnp.asarray(make_priors()[:64])
        loc = jnp.zeros((1, 64, 4))
        conf = jnp.zeros((1, 64, 2)).at[0, 0, 1].set(10.0)  # one confident box
        boxes, scores = batched_detect(loc, conf, priors, conf_thresh=0.5, top_k=8)
        assert (np.asarray(scores[0]) > 0).sum() >= 1


class TestWindows:
    def test_rolling_shapes(self):
        page = np.full((700, 1280), 255, np.uint8)
        crops, info = rolling_windows(page)
        assert crops.shape[1:] == (512, 512, 1)
        assert len(info) == len(crops)
        # 700 -> ceil((700-512)/128)+1 = 3 rows; 1280 -> ceil(768/128)+1 = 7
        assert len(crops) == 3 * 7

    def test_unmap_roundtrip(self):
        page = np.full((512, 512), 255, np.uint8)
        crops, info = rolling_windows(page)
        # a box covering the middle of the first full window
        boxes = np.zeros((len(info), 2, 4), np.float32)
        scores = np.zeros((len(info), 2), np.float32)
        boxes[0, 0] = [0.25, 0.25, 0.75, 0.75]
        scores[0, 0] = 0.9
        pb, ps = unmap_boxes(boxes, scores, info)
        assert len(pb) == 1
        np.testing.assert_allclose(pb[0], [128, 128, 384, 384], atol=1)

    def test_expand(self):
        b = np.asarray([[100, 100, 200, 200]], np.float32)
        out = expand_boxes(b, (1000, 1000), frac=0.05)
        np.testing.assert_allclose(out[0], [95, 95, 205, 205])


class TestMultiBoxLoss:
    def test_finite_and_sensitive(self):
        priors = jnp.asarray(make_priors()[:512])
        B, N = 2, 512
        rng = np.random.default_rng(0)
        loc = jnp.asarray(rng.normal(size=(B, N, 4)).astype(np.float32)) * 0.1
        conf = jnp.asarray(rng.normal(size=(B, N, 2)).astype(np.float32))
        gt = jnp.asarray([[[0.1, 0.1, 0.4, 0.2]], [[0.5, 0.5, 0.9, 0.6]]])
        valid = jnp.ones((B, 1), bool)
        ll, lc = multibox_loss(loc, conf, gt, valid, priors)
        assert np.isfinite(float(ll)) and np.isfinite(float(lc))
        assert float(lc) > 0
