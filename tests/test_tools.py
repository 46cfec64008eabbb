"""Offline tooling tests: image metric, vocab tools, lmdb builder, arxiv mining."""

import io
import tarfile

import numpy as np
import pytest

from doc2tex_tpu.tools.image_eval import (
    evaluate_image_pairs,
    img_edit_distance,
    trim_image,
)
from doc2tex_tpu.tools.vocab_tools import (
    augment_rare_tokens,
    build_vocab_with_threshold,
    count_tokens,
    find_unk_threshold,
)


def glyph_image(cols, h=16):
    """Column pattern -> white image with black pixels per column spec."""
    img = np.full((h, len(cols)), 255, np.uint8)
    for x, n in enumerate(cols):
        img[:n, x] = 0
    return img


class TestImageMetric:
    def test_identical(self):
        img = glyph_image([0, 3, 5, 3, 0])
        ed, ref, m1, m2 = img_edit_distance(img, img.copy())
        assert ed == 0 and m1 and m2

    def test_missing_pred(self):
        img = glyph_image([3, 3, 3])
        ed, ref, m1, m2 = img_edit_distance(img, None)
        assert ed == ref and not m1 and not m2

    def test_different(self):
        # columns must differ by >= 5 pixels to defeat the fuzzy clustering
        # (reference make_strs tolerance, evaluate_images.py:265)
        a = glyph_image([10, 10, 0, 2, 2])
        b = glyph_image([10, 10, 0, 9, 9])
        ed, ref, m1, m2 = img_edit_distance(a, b)
        assert ed > 0 and not m1

    def test_small_diff_fuzzy_matches(self):
        a = glyph_image([10, 10, 0, 8, 8])
        b = glyph_image([10, 10, 0, 9, 9])
        ed, ref, m1, m2 = img_edit_distance(a, b)
        assert ed > 0 and m1  # exact ED > 0 but fuzzy clustering matches

    def test_space_insensitive_variant(self):
        # same glyphs, different blank-column spacing
        a = glyph_image([5, 5, 0, 0, 0, 3, 3])
        b = glyph_image([5, 5, 0, 3, 3])
        ed, ref, m1, m2 = img_edit_distance(a, b)
        assert m2 and not m1  # matches w/o spaces only

    def test_trim(self):
        img = np.full((10, 10), 255, np.uint8)
        img[4:6, 4:6] = 0
        assert trim_image(img).shape == (2, 2)

    def test_aggregate(self):
        img = glyph_image([3, 3])
        res = evaluate_image_pairs([(img, img), (img, None)])
        assert res["accuracy_w_space"] == 0.5
        assert res["n"] == 2


class TestVocabTools:
    LINES = ["a b c", "a b", "a x", "a a a"]

    def test_counting(self):
        c = count_tokens(self.LINES)
        assert c["a"] == 6 and c["x"] == 1

    def test_threshold_filter(self):
        vocab, unk = build_vocab_with_threshold(self.LINES, unk_threshold=1)
        assert "x" not in vocab and "c" not in vocab
        assert ("x", 1) in unk

    def test_raw_mode(self):
        kept, unk = build_vocab_with_threshold(self.LINES, unk_threshold=0, raw=True)
        assert kept[0] == ("a", 6)  # frequency sorted

    def test_find_threshold(self):
        c = count_tokens(["a " * 1000, "b " * 500, "rare"])
        t = find_unk_threshold(c, cut_fraction=0.001)
        assert t >= 1  # 'rare' (1/1501) is below 0.1%

    def test_augmentation(self):
        extra = augment_rare_tokens(self.LINES, unk_threshold=1, target_freq=3)
        joined = " ".join(extra)
        assert joined.count("x") >= 2  # x pushed to >= 3 total

    def test_build_vocab_legacy(self):
        from doc2tex_tpu.tokenizer.vocab import build_vocab

        v = build_vocab([l.split() for l in self.LINES], min_freq=2)
        assert v[0] == "a" and "x" not in v


class TestLmdbRoundtrip:
    def test_write_read(self, tmp_path):
        # runs on the C lmdb package when installed, else the pure-Python
        # MDB implementation (pylmdb.py) — no skip either way
        from doc2tex_tpu.data.lmdb_reader import LmdbReader, write_lmdb

        images = [np.full((8, 12), 200, np.uint8), np.zeros((5, 7), np.uint8)]
        labels = ["x + y", "\\frac { 1 } { 2 }"]
        out = str(tmp_path / "db")
        write_lmdb(out, images, labels, ["a.png", "b.png"], map_size=1 << 24)
        r = LmdbReader(out)
        assert len(r) == 2
        assert r.label(1) == "x + y"
        assert r.size(2) == (5, 7)
        assert r.image(1).shape == (8, 12)
        assert r.name(2) == "b.png"


class TestArxivMining:
    def test_mine_tarball(self):
        tex = (
            r"\documentclass{article}\begin{document}"
            r"\begin{equation} \int_0^\infty e^{-x^2}\,dx = "
            r"\frac{\sqrt{\pi}}{2} \end{equation}\end{document}"
        )
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            data = tex.encode()
            info = tarfile.TarInfo("paper.tex")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        from doc2tex_tpu.tools.arxiv import mine_tarball

        found = mine_tarball(buf.getvalue())
        assert len(found) == 1 and "e^{-x^2}" in found[0]


class TestLabelTools:
    def test_manifest_filter_split(self, tmp_path):
        from doc2tex_tpu.tools.label_tools import (
            build_label_manifest,
            filter_supported_tokens,
            train_val_test_split,
            write_manifest,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        formulas = [f"x + {i}" for i in range(10)]
        for i in (0, 2, 5):  # only some rendered successfully
            (d / f"f{i:06d}.png").write_bytes(b"png")
        rows = build_label_manifest(str(d), formulas)
        assert [r[1] for r in rows] == ["x + 0", "x + 2", "x + 5"]

        kept, dropped = filter_supported_tokens(
            rows + [("bad.png", "x \\unsupported")], ["x", "+"] + [str(i) for i in range(10)]
        )
        assert len(kept) == 3 and len(dropped) == 1

        tr, va, te = train_val_test_split(rows * 10, 0.2, 0.2)
        assert len(tr) + len(va) + len(te) == 30
        assert len(va) == 6 and len(te) == 6

        out = tmp_path / "labels.tsv"
        write_manifest(rows, str(out))
        assert out.read_text().count("\t") == 3


class TestPureLmdbFormat:
    """Byte-level MDB format implementation (data/pylmdb.py): the reader
    walks real meta/branch/leaf/overflow pages; the writer emits them."""

    def test_multilevel_tree_and_overflow(self, tmp_path):
        import numpy as np

        from doc2tex_tpu.data.pylmdb import PyLmdbReader, write_pylmdb

        rng = np.random.default_rng(0)
        pairs = []
        for i in range(2500):
            k = b"key-%09d" % i
            if i % 100 == 0:  # > node_max -> overflow chain
                v = rng.integers(0, 256, 9000, dtype=np.uint8).tobytes()
            else:
                v = (b"v%d" % i) * (i % 11 + 1)
            pairs.append((k, v))
        root = str(tmp_path / "db")
        write_pylmdb(root, pairs)
        r = PyLmdbReader(root)
        assert r.entries == len(pairs)
        lut = dict(pairs)
        for k in (b"key-%09d" % i for i in (0, 1, 99, 100, 1249, 2499)):
            assert r.get(k) == lut[k]
        assert r.get(b"nope") is None
        # full in-order scan
        items = list(r.items())
        assert [k for k, _ in items] == sorted(lut)
        assert all(lut[k] == v for k, v in items)

    def test_empty_store(self, tmp_path):
        from doc2tex_tpu.data.pylmdb import PyLmdbReader, write_pylmdb

        root = str(tmp_path / "empty")
        write_pylmdb(root, [])
        r = PyLmdbReader(root)
        assert r.get(b"x") is None and list(r.items()) == []

    def test_meta_selection_by_txnid(self, tmp_path):
        # live meta is the one with the larger txnid (pages 0/1)
        from doc2tex_tpu.data.pylmdb import PyLmdbReader, write_pylmdb

        root = str(tmp_path / "db")
        write_pylmdb(root, [(b"a", b"1")])
        r = PyLmdbReader(root)
        assert r.get(b"a") == b"1"  # meta 1 (txnid 1) wins over meta 0
