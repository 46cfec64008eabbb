"""Demo App pipeline tests (demo/app.py): detect -> crop -> recognize,
including the round-2 voting-stitch option."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_demo_app():
    """Import OUR demo/app.py by path: the torch-parity tests put
    /root/reference on sys.path, where a same-named reference `demo`
    package would otherwise shadow ours in full-suite runs."""
    spec = importlib.util.spec_from_file_location(
        "d2t_demo_app", os.path.join(REPO, "demo", "app.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def small_recog_config():
    from tests.test_loader_engine import small_config

    return small_config()


class TestRecogConfigContract:
    """Shipped demo decode contract (demo/recog_cfg.yaml, round 3).
    Match: reference demo/recog_cfg.yaml:1-59 + demo/app.py:151-158
    (common block merged with the selected version block)."""

    def test_version_blocks_merge(self):
        from doc2tex_tpu.recognition import load_recog_config

        for version, dims, max_len in (
            ("version1", [800, 800], 500),
            ("version2", [224, 960], 200),
        ):
            cfg, weights = load_recog_config(version=version)
            assert cfg["max_dimension"] == dims
            assert cfg["batch_max_length"] == max_len
            # the demo decode contract: beam 10, pad True
            assert int(cfg["beam_size"]) == 10
            assert cfg["pad"] is True
            assert weights is None  # no trained weights in-repo -> warned
            assert os.path.exists(cfg["vocab"])

    def test_vocab_reference_scale(self):
        from doc2tex_tpu.recognition import load_recog_config
        from doc2tex_tpu.tokenizer.vocab import load_vocab

        cfg, _ = load_recog_config(version="version2")
        vocab = load_vocab(cfg["vocab"])
        assert len(vocab) >= 500
        assert len(set(vocab)) == len(vocab)

    def test_synthetic_release_block(self):
        # the in-repo released model version: soak-trained weights +
        # architecture overrides (smaller than the flagship common block)
        from doc2tex_tpu.recognition import load_recog_config

        cfg, weights = load_recog_config(version="synthetic")
        assert cfg["max_dimension"] == [224, 704]
        assert cfg["SequenceModeling"]["params"]["depth"] == 3
        assert cfg["SequenceModeling"]["params"]["hidden_size"] == 128
        assert cfg["Prediction"]["params"]["hidden_size"] == 128
        assert cfg["clahe"] is False
        assert int(cfg["beam_size"]) == 10  # inherits the demo contract
        assert os.path.exists(cfg["vocab"])
        if weights is not None:  # exported weights ship in-repo
            assert os.path.getsize(weights) > 1 << 20

    def test_synthetic_tfm_release_block(self):
        """Second released version: the Transformer decoder family
        (family A/B winner on the hard benchmark — EM 0.8313 vs 0.725).
        The weights must restore into the TFM-head model exactly
        (load_pretrained_variables errors on any tree mismatch)."""
        import jax
        import numpy as np

        from doc2tex_tpu.models import build_model
        from doc2tex_tpu.recognition import load_recog_config
        from doc2tex_tpu.tokenizer.converters import TFMLabelConverter
        from doc2tex_tpu.tokenizer.vocab import load_vocab
        from doc2tex_tpu.train.checkpoint import load_pretrained_variables
        from doc2tex_tpu.train.trainer import init_model

        cfg, weights = load_recog_config(version="synthetic_tfm")
        assert cfg["Prediction"]["name"] == "TFM"
        assert cfg["Prediction"]["params"]["d_model"] == 128
        assert os.path.exists(weights)

        conv = TFMLabelConverter(load_vocab(cfg["vocab"]))
        model = build_model(cfg, conv.num_classes)
        params0, stats0 = init_model(
            model, jax.random.PRNGKey(0), (1, 32, 32, 1), 8
        )
        params, stats, info = load_pretrained_variables(
            weights, params0, stats0
        )
        emb = np.asarray(
            params["predicter"]["word_embed"], np.float32
        )
        assert np.abs(emb).sum() > 0  # real trained values, not init

    def test_synthetic_tfm_big_release_block(self):
        """Flagship-scale release: the capacity-scaling arm
        (structured_soak --hard --family tfm --big, 256x6 encoder +
        6-layer TFM head) — held-out beam-5 EM 0.8562 @ 100k
        (tools/hard_tfm_big_curve.jsonl).  Weights must restore into
        the big-arch model exactly."""
        import jax
        import numpy as np

        from doc2tex_tpu.models import build_model
        from doc2tex_tpu.recognition import load_recog_config
        from doc2tex_tpu.tokenizer.converters import TFMLabelConverter
        from doc2tex_tpu.tokenizer.vocab import load_vocab
        from doc2tex_tpu.train.checkpoint import load_pretrained_variables
        from doc2tex_tpu.train.trainer import init_model

        cfg, weights = load_recog_config(version="synthetic_tfm_big")
        assert cfg["Prediction"]["name"] == "TFM"
        assert cfg["Prediction"]["params"]["d_model"] == 256
        assert cfg["Prediction"]["params"]["num_decoder_layers"] == 6
        assert cfg["SequenceModeling"]["params"]["depth"] == 6
        assert int(cfg["beam_size"]) == 10  # inherits the demo contract
        assert os.path.exists(weights)
        assert os.path.getsize(weights) > 20 << 20  # 22.7M params f16

        conv = TFMLabelConverter(load_vocab(cfg["vocab"]))
        model = build_model(cfg, conv.num_classes)
        params0, stats0 = init_model(
            model, jax.random.PRNGKey(0), (1, 32, 32, 1), 8
        )
        params, stats, info = load_pretrained_variables(
            weights, params0, stats0
        )
        emb = np.asarray(params["predicter"]["word_embed"], np.float32)
        assert np.abs(emb).sum() > 0  # real trained values, not init

    def test_unknown_version_raises(self):
        import pytest as _pytest

        from doc2tex_tpu.recognition import load_recog_config

        with _pytest.raises(KeyError):
            load_recog_config(version="version99")


class TestAppNoDetect:
    def test_whole_page_recognition(self):
        App = load_demo_app().App

        app = App(recog_config=small_recog_config(), use_detect=False)
        page = np.full((48, 96), 255, np.uint8)
        page[10:30, 10:80] = 0
        out = app(page)
        assert len(out) == 1
        (box, latex), = out
        assert box == (0, 0, 96, 48)
        assert isinstance(latex, str)


class TestAppStitch:
    def test_stitch_branch_with_canned_detector(self, monkeypatch):
        App = load_demo_app().App

        app = App.__new__(App)  # skip SSD init cost
        from doc2tex_tpu.recognition.flow import MathRecognition

        app.use_detect = True
        app.stitch = True
        app.stitch_votes = 3
        app.recognizer = MathRecognition(config=small_recog_config())

        class FakeDetector:
            def detect_page(self, page, nms_iou=None, raw=False):
                assert raw  # stitch wants every det, no NMS/top-k cap
                boxes = np.array(
                    [
                        [38, 48, 205, 82],
                        [42, 52, 198, 78],
                        [40, 50, 200, 80],
                        [41, 49, 202, 81],
                    ],
                    np.float32,
                )
                return boxes, np.full(len(boxes), 0.9, np.float32)

            def crop_regions(self, page, boxes):
                return [
                    page[int(y1):int(y2), int(x1):int(x2)]
                    for x1, y1, x2, y2 in boxes
                ]

        app.detector = FakeDetector()
        page = np.full((700, 1280), 255, np.uint8)
        page[50:80, 40:200] = 0
        out = app(page)
        assert len(out) == 1  # four overlapping dets -> one stitched region
        box, latex = out[0]
        # fit-to-ink snapped to the ink bounds (page is pre-resize 1280-wide
        # so scale == 1.0)
        assert box == (40, 50, 200, 80)
        assert isinstance(latex, str)
