import numpy as np
import pytest

from doc2tex_tpu.config import make_config
from doc2tex_tpu.data.buckets import (
    BucketTable,
    batch_plan,
    get_divisible_size,
    get_size,
    make_ladder,
    pad_to_bucket,
    plan_buckets,
)


def cfg(**kw):
    base = dict(
        max_dimension=[448, 960],
        min_dimension=[32, 32],
        downsample=2,
        scale_factor=32,
    )
    base.update(kw)
    return make_config(base)


class TestSizeMath:
    def test_divisible_snaps_up(self):
        assert get_divisible_size(33, 65) == (64, 96)

    def test_divisible_respects_max(self):
        assert get_divisible_size(440, 950, max_dimension=[448, 960]) == (448, 960)
        # snapping up would exceed the cap -> snap down
        assert get_divisible_size(450, 970, max_dimension=[448, 960]) == (448, 960)

    def test_get_size_no_downsample_identity(self):
        c = cfg(downsample=1)
        assert get_size(100, 333, c) == (100, 333)

    def test_get_size_downsamples_and_snaps(self):
        c = cfg()
        h, w = get_size(100, 400, c)
        assert h % 32 == 0 and w % 32 == 0
        assert h == 64 and w == 224  # 50->64, 200->224

    def test_get_size_clamps_to_max(self):
        c = cfg()
        h, w = get_size(4000, 4000, c)
        assert h <= 448 and w <= 960

    def test_get_size_upscales_to_min(self):
        c = cfg()
        h, w = get_size(20, 20, c)
        assert h >= 32 and w >= 32


class TestBucketTable:
    def test_ladder_bounded(self):
        # candidate set is bounded (only buckets with data actually compile)
        t = make_ladder([32, 32], [448, 960], 32)
        assert len(t) < 100

    def test_lookup_smallest_fit(self):
        t = BucketTable(((32, 32), (64, 64), (128, 128)))
        assert t.lookup(33, 40) == (64, 64)
        assert t.lookup(10, 10) == (32, 32)
        assert t.lookup(200, 10) is None

    def test_plan_excludes_oversized(self):
        c = cfg()
        sizes = [(64, 128), (100, 300), (5000, 9000)]
        table, clusters, excluded = plan_buckets(sizes, c)
        total = sum(len(v) for v in clusters.values())
        # 5000x9000 / 2 -> snapped beyond max on H after clamp logic keeps
        # it <= max, so it lands in a bucket; nothing should be dropped here
        assert total + len(excluded) == 3

    def test_pad_to_bucket(self):
        img = np.zeros((30, 50), np.uint8)
        out = pad_to_bucket(img, (32, 64))
        assert out.shape == (32, 64)
        assert (out[30:, :] == 255).all() and (out[:, 50:] == 255).all()
        with pytest.raises(ValueError):
            pad_to_bucket(np.zeros((100, 10), np.uint8), (32, 64))


class TestBatchPlan:
    def test_batches_within_bucket(self):
        clusters = {(32, 64): list(range(10)), (64, 64): list(range(10, 13))}
        batches = batch_plan(clusters, 4, keep_smaller_batches=True,
                             rng=np.random.default_rng(0))
        sizes = sorted(len(b[1]) for b in batches)
        assert sizes == [2, 3, 4, 4]
        seen = sorted(i for _, idxs in batches for i in idxs)
        assert seen == list(range(13))

    def test_drop_last(self):
        clusters = {(32, 64): list(range(10))}
        batches = batch_plan(clusters, 4, keep_smaller_batches=False,
                             rng=np.random.default_rng(0))
        assert all(len(b[1]) == 4 for b in batches)
        assert len(batches) == 2


class TestStructuredGrammar:
    """Round-2 hardened synthetic grammar (data/synthetic.py)."""

    def test_tokens_all_in_vocab_and_deterministic(self):
        from doc2tex_tpu.data.synthetic import (
            SYNTH_VOCAB,
            synth_structured_dataset,
        )

        a_imgs, a_labels = synth_structured_dataset(50, seed=3)
        b_imgs, b_labels = synth_structured_dataset(50, seed=3)
        assert a_labels == b_labels
        assert all(
            np.array_equal(x, y) for x, y in zip(a_imgs, b_imgs)
        )
        for lb in a_labels:
            assert all(t in SYNTH_VOCAB for t in lb.split())

    def test_structure_present_and_braced(self):
        from doc2tex_tpu.data.synthetic import synth_structured_dataset

        _, labels = synth_structured_dataset(300, seed=5, max_len=36)
        joined = " ".join(labels)
        for must in ("\\frac", "\\sqrt", "^", "\\begin{matrix}"):
            assert must in joined
        # braces balance within each label
        for lb in labels:
            toks = lb.split()
            depth = 0
            for t in toks:
                depth += (t == "{") - (t == "}")
                assert depth >= 0, lb
            assert depth == 0, lb
        # matrix rows well-formed: begin...end pairing
        for lb in labels:
            assert lb.count("\\begin{matrix}") == lb.count("\\end{matrix}")

    def test_shapes_within_canvas(self):
        from doc2tex_tpu.data.synthetic import synth_structured_dataset

        imgs, _ = synth_structured_dataset(
            100, seed=7, max_h=220, max_w=500
        )
        for im in imgs:
            assert im.ndim == 2 and im.dtype == np.uint8
            assert im.shape[0] <= 220 and im.shape[1] <= 500
            assert (im == 255).any()  # white background present

    def test_no_clipped_labels(self):
        # oversized renders regenerate instead of clipping: no ink may
        # touch the canvas edge (would mean label tokens without pixels)
        from doc2tex_tpu.data.synthetic import synth_structured_dataset

        imgs, _ = synth_structured_dataset(
            400, seed=31, min_len=4, max_len=44, max_h=156, max_w=440
        )
        for im in imgs:
            assert not (im[-1, :] < 200).any()
            assert not (im[:, -1] < 200).any()

    def test_labels_are_valid_latex(self):
        # cross-system invariant: every generated structured label passes
        # the KaTeX-grade validator (incl. strict unknown-command checks)
        from doc2tex_tpu.data.synthetic import synth_structured_dataset
        from doc2tex_tpu.latex.validate import validate_formula

        _, labels = synth_structured_dataset(300, seed=17, max_len=40)
        for lb in labels:
            assert validate_formula(lb) is None, lb

    def test_left_right_balanced(self):
        from doc2tex_tpu.data.synthetic import synth_structured_dataset

        _, labels = synth_structured_dataset(300, seed=23, max_len=40)
        for lb in labels:
            assert lb.count("\\left(") == lb.count("\\right)"), lb


class TestOverpadAugment:
    """Round-5 pad-invariance: plan_buckets promotes train samples to
    larger ladder buckets (the serving-coalesce distribution)."""

    def _cfg(self, **kw):
        c = {"min_dimension": [32, 32], "max_dimension": [128, 512],
             "scale_factor": 32, "bucket_growth": 1.5}
        c.update(kw)
        return c

    def test_overpad_promotes_within_ratio(self):
        import numpy as np

        sizes = [(40, 90)] * 200
        c = self._cfg(overpad_prob=0.5, overpad_ratio=4.0)
        table, clusters, _ = plan_buckets(
            sizes, c, overpad_rng=np.random.default_rng(3))
        native = table.lookup(40, 90)
        assert native in clusters  # most stay native
        promoted = {b: len(v) for b, v in clusters.items() if b != native}
        assert promoted, "no samples were promoted"
        na = native[0] * native[1]
        for b, n in promoted.items():
            # containing bucket, within the area-ratio guard
            assert b[0] >= native[0] and b[1] >= native[1]
            assert b[0] * b[1] <= 4.0 * na
        frac = sum(promoted.values()) / len(sizes)
        assert 0.3 < frac < 0.7  # ~overpad_prob

    def test_overpad_off_without_rng(self):
        sizes = [(40, 90)] * 50
        c = self._cfg(overpad_prob=0.5)
        table, clusters, _ = plan_buckets(sizes, c, overpad_rng=None)
        assert list(clusters) == [table.lookup(40, 90)]

    def test_overpad_zero_prob_identity(self):
        import numpy as np

        sizes = [(40, 90)] * 50
        table, clusters, _ = plan_buckets(
            sizes, self._cfg(), overpad_rng=np.random.default_rng(0))
        assert list(clusters) == [table.lookup(40, 90)]
