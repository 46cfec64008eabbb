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

    def test_int8_trace_close_to_f32(self, model_vars):
        # round-4 detect quant knob: the SSD trunk traced under
        # quantized_inference must produce finite, near-f32 outputs
        # (shape-gated int8 convs, ops/quant.py)
        from doc2tex_tpu.ops.quant import quantized_inference

        model, variables = model_vars
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 512, 512, 3)).astype(np.float32))
        loc0, conf0 = jax.jit(model.apply)(variables, x)
        with quantized_inference(parts=("encoder",)):
            loc1, conf1 = jax.jit(model.apply)(variables, x)
        assert np.isfinite(np.asarray(loc1)).all()
        assert np.isfinite(np.asarray(conf1)).all()
        # int8 is an approximation; demand agreement, not equality
        denom = np.abs(np.asarray(conf0)).mean() + 1e-6
        rel = np.abs(np.asarray(conf1) - np.asarray(conf0)).mean() / denom
        assert rel < 0.35, f"int8 conf drifted {rel:.3f} from f32"
        # and the quant context really changed the trace (not a no-op)
        assert not np.allclose(np.asarray(conf1), np.asarray(conf0))


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


class TestStitching:
    """Voting-based page stitching (reference stitch_patches_pdf.py)."""

    def _page(self):
        page = np.full((300, 400), 255, np.uint8)
        page[50:80, 40:200] = 0     # region A ink
        page[150:170, 250:380] = 0  # region B ink
        return page

    def test_equal_voting_recovers_regions(self):
        from doc2tex_tpu.detection.stitch import stitch_page

        page = self._page()
        dets = []
        # overlapping windowed detections around each region (jittered)
        for dx, dy in [(-4, -3), (0, 0), (5, 2), (3, -2)]:
            dets.append([40 + dx, 50 + dy, 200 + dx, 80 + dy, 0.9])
            dets.append([250 + dx, 150 + dy, 380 + dx, 170 + dy, 0.8])
        # one stray low-overlap detection: below the vote threshold
        dets.append([10, 250, 60, 290, 0.9])
        boxes = stitch_page(
            np.array(dets, np.float32), page.shape, page_image=page,
            algorithm="equal", thresh_votes=3,
        )
        assert len(boxes) == 2
        # fit-to-ink postprocess snaps to the exact ink bounds
        assert [40, 50, 200, 80] in boxes
        assert [250, 150, 380, 170] in boxes

    @pytest.mark.parametrize("algo", ["sum", "max", "avg"])
    def test_score_voting_algorithms(self, algo):
        from doc2tex_tpu.detection.stitch import vote_for_regions

        dets = np.array(
            [[10, 10, 50, 30, 0.6], [12, 12, 52, 32, 0.8]], np.float32
        )
        thresh = {"sum": 1.2, "max": 0.7, "avg": 0.65}[algo]
        mask = vote_for_regions(dets, (60, 60), algo, thresh)
        assert mask[20, 20] == 1     # double-covered core passes
        assert mask[5, 5] == 0       # uncovered background doesn't

    def test_fit_box_expands_over_components(self):
        from doc2tex_tpu.detection.stitch import fit_box

        im_bw = np.zeros((50, 50), np.uint8)
        im_bw[10:20, 10:40] = 1  # one component wider than the box
        assert fit_box(im_bw, [15, 12, 25, 18]) == [10, 10, 40, 20]


class TestCrohmeScoring:
    """CROHME Task-3 coarse/fine detection scoring
    (reference IOU_lib/IOUevaluater.py)."""

    def test_perfect_detection(self):
        from doc2tex_tpu.detection.evaluate import crohme_detection_scores

        gt = [np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)]
        out = crohme_detection_scores(gt, gt)
        assert out["coarse_f"] == 1.0 and out["fine_f"] == 1.0
        assert out["correctDet_c"] == 2 and out["correctDet_f"] == 2

    def test_duplicate_detection_unique_matching(self):
        from doc2tex_tpu.detection.evaluate import crohme_detection_scores

        gt = [np.array([[0, 0, 100, 100], [100, 0, 200, 100]], np.float32)]
        shared = [0, 0, 130, 100]    # IoU(A)=100/130=0.77, IoU(B)=30/200=0.15
        backup = [112, 0, 185, 100]  # IoU(B)=73/100=0.73 (coarse only)
        out = crohme_detection_scores(
            [np.array([shared, backup], np.float32)], gt
        )
        # A matches `shared` at 0.77 (coarse+fine); B's best is `backup`
        # at 0.73 — above 0.5, below 0.75
        assert out["correctDet_c"] == 2
        assert out["correctDet_f"] == 1
        assert out["coarse_pre"] == 1.0 and out["coarse_rec"] == 1.0

    def test_shared_best_det_falls_back(self):
        from doc2tex_tpu.detection.evaluate import crohme_detection_scores

        # both GTs' best candidate is det0; loser falls back to det1
        gt = [np.array([[0, 0, 100, 100], [10, 0, 110, 100]], np.float32)]
        det0 = [0, 0, 100, 100]      # IoU(gt0)=1.0, IoU(gt1)=0.818
        det1 = [12, 0, 112, 100]     # IoU(gt1)=0.96, IoU(gt0)=0.785
        out = crohme_detection_scores([np.array([det0, det1], np.float32)], gt)
        assert out["correctDet_c"] == 2  # unique matching resolves both
        assert out["correctDet_f"] == 2

    def test_false_positives_hit_precision(self):
        from doc2tex_tpu.detection.evaluate import crohme_detection_scores

        gt = [np.array([[0, 0, 10, 10]], np.float32)]
        det = [np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)]
        out = crohme_detection_scores(det, gt)
        assert out["coarse_pre"] == 0.5 and out["coarse_rec"] == 1.0


class TestSSDTrainToEval:
    def test_detector_output_flows_to_stitch_and_scores(self):
        """Synthetic GTDB page -> detector -> voting stitch -> CROHME
        scoring: the full detection-eval pipeline composes (random
        weights, so scores are whatever they are; keys must be there)."""
        from doc2tex_tpu.detection.flow import MathDetector
        from doc2tex_tpu.detection.evaluate import crohme_detection_scores
        from doc2tex_tpu.detection.stitch import stitch_page

        page = np.full((600, 700), 255, np.uint8)
        page[100:160, 50:400] = 0
        gt_boxes = np.array([[50, 100, 400, 160]], np.float32)

        det = MathDetector(conf_thresh=0.01, stride=(512, 512), batch_size=2)
        boxes, scores = det.detect_page(page)
        bs = (
            np.concatenate([boxes, scores[:, None]], axis=1)
            if len(boxes)
            else np.zeros((0, 5), np.float32)
        )
        stitched = stitch_page(bs, page.shape[:2], page_image=page,
                               thresh_votes=1)
        out = crohme_detection_scores(
            [np.array(stitched, np.float32).reshape(-1, 4)],
            [gt_boxes],
        )
        assert set(["coarse_f", "fine_f", "allGTbox", "allDet"]) <= set(out)
        assert out["allGTbox"] == 1


class TestStitchRgbAndRaw:
    def test_rgb_page_image(self):
        from doc2tex_tpu.detection.stitch import stitch_page

        page = np.full((200, 300, 3), 255, np.uint8)
        page[50:80, 40:120] = 0
        dets = np.array(
            [[40, 50, 120, 80, 0.9], [42, 52, 118, 78, 0.9]], np.float32
        )
        out = stitch_page(dets, (200, 300), page_image=page, thresh_votes=2)
        assert out == [[40, 50, 120, 80]]

    def test_weights_path_roundtrip(self, tmp_path):
        # trained SSD params saved by tools/detection_soak.py --save must
        # restore into a fresh MathDetector (the shipped-weights demo path)
        from types import SimpleNamespace

        import jax

        from doc2tex_tpu.detection.flow import MathDetector
        from doc2tex_tpu.train.checkpoint import save_checkpoint

        det = MathDetector(stride=(512, 512), batch_size=1, seed=3)
        path = str(tmp_path / "ssd.msgpack")
        save_checkpoint(
            path,
            SimpleNamespace(step=1, params=det.variables["params"],
                            batch_stats={}, opt_state={}),
            {},
        )
        det2 = MathDetector(stride=(512, 512), batch_size=1, seed=7,
                            weights_path=path)
        for a, b in zip(
            jax.tree_util.tree_leaves(det.variables["params"]),
            jax.tree_util.tree_leaves(det2.variables["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_detect_page_raw_skips_nms(self):
        from doc2tex_tpu.detection.flow import MathDetector

        det = MathDetector(conf_thresh=0.01, stride=(512, 512), batch_size=2)
        page = np.full((512, 512), 255, np.uint8)
        page[100:160, 50:400] = 0
        raw_b, raw_s = det.detect_page(page, raw=True)
        nms_b, nms_s = det.detect_page(page)
        # raw returns at least as many detections as the NMS'd path
        assert len(raw_b) >= len(nms_b)


class TestDeviceWindows:
    def test_device_extraction_matches_host_path(self):
        """Device-side window extraction (one page upload, static slices +
        centered white pad inside jit) must reproduce the host
        rolling_windows path bit-exactly on a ladder-aligned page."""
        from doc2tex_tpu.detection.flow import MathDetector

        page = np.full((512, 768), 255, np.uint8)
        page[100:160, 50:400] = 0
        page[300:340, 500:700] = 0
        det_host = MathDetector(conf_thresh=0.01, stride=(512, 512),
                                batch_size=2, device_windows=False)
        det_dev = MathDetector(conf_thresh=0.01, stride=(512, 512),
                               batch_size=2, device_windows=True,
                               variables=det_host.variables)
        hb, hs = det_host.detect_page(page)
        db, ds = det_dev.detect_page(page)
        np.testing.assert_array_equal(db, hb)
        np.testing.assert_array_equal(ds, hs)
        # raw path too (the stitch input)
        hb, hs = det_host.detect_page(page, raw=True)
        db, ds = det_dev.detect_page(page, raw=True)
        np.testing.assert_array_equal(db, hb)
        np.testing.assert_array_equal(ds, hs)

    def test_ladder_pad_clips_to_original_page(self):
        """An off-ladder page is white-padded up to the compile ladder;
        every returned box must still land inside the ORIGINAL page."""
        from doc2tex_tpu.detection.flow import MathDetector

        page = np.full((600, 700), 255, np.uint8)
        page[100:160, 50:400] = 0
        det = MathDetector(conf_thresh=0.01, stride=(512, 512),
                           batch_size=2)
        assert det._snap_page(page).shape == (768, 768)
        boxes, scores = det.detect_page(page)
        assert len(boxes) == len(scores)
        if len(boxes):
            assert (boxes[:, 0::2] <= 700).all()
            assert (boxes[:, 1::2] <= 600).all()
            assert (boxes[:, 2] - boxes[:, 0] >= 2).all()
            assert (boxes[:, 3] - boxes[:, 1] >= 2).all()


class TestWindowSampleSoak:
    """Round-5 windows-style soak sampler: training windows must match
    the inference distribution (clipped boxes, sliver negatives)."""

    def test_window_sample_contract(self):
        import os
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools"))
        from detection_soak import window_sample

        rng = np.random.default_rng(7)
        n_pos = n_neg = 0
        for _ in range(4):
            wins, gt, valid = window_sample(rng)
            assert wins.shape == (8, 512, 512) and wins.dtype == np.uint8
            assert gt.shape == (8, 8, 4) and valid.shape == (8, 8)
            gv = gt[valid]
            if len(gv):
                # normalized, well-formed corner boxes
                assert (gv >= 0).all() and (gv <= 1).all()
                assert (gv[:, 2] > gv[:, 0]).all()
                assert (gv[:, 3] > gv[:, 1]).all()
            for w, v in zip(wins, valid):
                if v.any():
                    n_pos += 1
                    assert (w < 200).any()  # a positive window holds ink
                else:
                    n_neg += 1
        # random offsets over 2-8-region pages give BOTH kinds
        assert n_pos > 0 and n_neg > 0

    def test_expand_frac_knob_reaches_detect_page(self):
        """MathDetector(expand_frac=) must change the returned boxes (the
        round-5 framing sweep knob)."""
        from doc2tex_tpu.detection.flow import MathDetector

        page = np.full((512, 512), 255, np.uint8)
        page[100:150, 60:300] = 0
        d0 = MathDetector(conf_thresh=0.0, expand_frac=0.0, seed=3)
        d1 = MathDetector(
            variables=d0.variables, conf_thresh=0.0, expand_frac=0.2)
        b0, s0 = d0.detect_page(page)
        b1, s1 = d1.detect_page(page)
        assert len(b0) and len(b1)
        np.testing.assert_array_equal(s0, s1)
        w0 = b0[:, 2] - b0[:, 0]
        w1 = b1[:, 2] - b1[:, 0]
        assert (w1 >= w0).all() and (w1 > w0).any()
