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

    def test_torn_meta0_recovers_via_meta1(self, tmp_path):
        # a torn meta-0 with a valid meta-1 is a legitimate LMDB
        # crash-recovery state: liblmdb opens via the other meta page
        import os

        from doc2tex_tpu.data.pylmdb import PyLmdbReader, write_pylmdb

        root = str(tmp_path / "db")
        write_pylmdb(root, [(b"a", b"1"), (b"b", b"2")])
        path = os.path.join(root, "data.mdb")
        with open(path, "r+b") as f:
            f.seek(16)  # meta-0 payload: clobber the magic
            f.write(b"\x00\x00\x00\x00")
        r = PyLmdbReader(root)
        assert r.get(b"a") == b"1" and r.get(b"b") == b"2"

    def test_stitch_pdf_csv_driver(self, tmp_path):
        """PDF-level stitch driver (VERDICT r2 missing #2): per-PDF raw
        detection CSVs -> per-page voting stitch -> appended
        page,x1,y1,x2,y2 rows.  Match: reference
        stitch_patches_pdf.py:203-317."""
        import numpy as np

        from tools.stitch_pdf import stitch_from_csvs

        det_dir = tmp_path / "det"
        det_dir.mkdir()
        rows = []
        # two pages; page 0 has a dense cluster of overlapping detections
        # (stitch votes them into one region), page 1 a separate cluster
        for page, (bx, by) in ((0, (100, 50)), (1, (300, 200))):
            for dx in range(0, 40, 4):
                rows.append(
                    [page, bx + dx, by, bx + dx + 120, by + 40, 0.9]
                )
        np.savetxt(det_dir / "paper1.csv", np.asarray(rows, float),
                   fmt="%.2f", delimiter=",")
        data_file = tmp_path / "pdfs.txt"
        data_file.write_text("paper1\n\n")
        out_dir = tmp_path / "out"
        written = stitch_from_csvs(
            str(data_file), str(det_dir), None, str(out_dir),
            thresh_votes=5,
        )
        assert written
        merged = np.genfromtxt(out_dir / "paper1.csv", delimiter=",")
        if merged.ndim == 1:
            merged = merged[None]
        pages = set(merged[:, 0].astype(int))
        assert pages == {0, 1}
        # each page's cluster stitched to ~1 region spanning the cluster
        for page in (0, 1):
            page_rows = merged[merged[:, 0] == page]
            assert 1 <= len(page_rows) <= 2
            x1, y1, x2, y2 = page_rows[0, 1:]
            assert x2 - x1 >= 100 and y2 - y1 >= 20

        # num_workers > 1 takes the pool path and agrees
        out2 = tmp_path / "out2"
        stitch_from_csvs(
            str(data_file), str(det_dir), None, str(out2),
            thresh_votes=5, num_workers=2,
        )
        m2 = np.genfromtxt(out2 / "paper1.csv", delimiter=",")
        np.testing.assert_allclose(m2, merged)

    def test_evaluate_images_csv_merge(self, tmp_path):
        """Image-metric CSV-merge driver (VERDICT r2 missing #3): merges
        img_distance/match columns into the prediction CSV.  Match:
        reference evaluate_images.py:51-164."""
        import csv as _csv

        import numpy as np
        import pytest

        pytest.importorskip("PIL")
        from PIL import Image

        from tools.evaluate_images import merge_image_metrics

        gold = tmp_path / "gold"
        pred = tmp_path / "pred"
        gold.mkdir()
        pred.mkdir()
        rng = np.random.default_rng(0)
        names = []
        for i in range(3):
            img = (rng.random((40, 120)) > 0.1).astype(np.uint8) * 255
            name = f"f{i}.png"
            Image.fromarray(img).save(gold / name)
            if i == 0:
                Image.fromarray(img).save(pred / name)  # exact match
            elif i == 1:
                noisy = img.copy()
                noisy[:, :60] = 255  # half blanked -> mismatch
                Image.fromarray(noisy).save(pred / name)
            # i == 2: missing pred render -> counts fully wrong
            names.append(name)

        csv_path = tmp_path / "results.csv"
        with open(csv_path, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["name", "pred", "label", "ed", "iscorrect"])
            for n in names:
                w.writerow([n, "x", "x", "0.0", "1"])

        agg = merge_image_metrics(
            str(gold), str(pred), str(csv_path), str(tmp_path / "log")
        )
        assert agg["n"] == 3
        assert 0 < agg["accuracy_w_space"] < 1
        merged = tmp_path / "results_img_metric.csv"
        assert merged.exists()
        with open(merged) as f:
            rows = list(_csv.reader(f))
        header = rows[0]
        for col in ("img_distance", "match_w_space", "match_wo_space"):
            assert col in header
        by = {r[0]: dict(zip(header, r)) for r in rows[1:]}
        assert by["f0.png"]["match_w_space"] == "1"
        assert by["f2.png"]["match_w_space"] == "0"
        # unmatched filenames recorded
        uf = (tmp_path / "log" / "unmatched_filenames.txt").read_text()
        assert "f2.png" in uf

    def test_both_metas_torn_raises(self, tmp_path):
        import os

        import pytest

        from doc2tex_tpu.data.pylmdb import PyLmdbReader, write_pylmdb

        root = str(tmp_path / "db")
        write_pylmdb(root, [(b"a", b"1")])
        path = os.path.join(root, "data.mdb")
        with open(path, "r+b") as f:
            psize = 4096
            for off in (16, psize + 16):
                f.seek(off)
                f.write(b"\x00\x00\x00\x00")
        with pytest.raises(ValueError):
            PyLmdbReader(root)

class TestInspectImages:
    def test_inspect_images_merge_and_split(self, tmp_path):
        """Visual inspection drivers: gold-over-pred compare sheets
        (reference merge_img.py:12-58) and match/un_match folder split
        (reference split_image_folder.py:7-35)."""
        import numpy as np
        import pytest

        pytest.importorskip("PIL")
        from PIL import Image

        from tools.inspect_images import (
            build_compare_sheets,
            split_by_match,
            vstack_autopad,
        )

        # vstack_autopad: mixed widths right-padded, grayscale -> RGB
        a = np.full((4, 6), 10, np.uint8)
        b = np.full((3, 9, 3), 20, np.uint8)
        sheet = vstack_autopad((a, b), pad_value=7)
        assert sheet.shape == (7, 9, 3)
        assert (sheet[:4, :6] == 10).all() and (sheet[:4, 6:] == 7).all()
        assert (sheet[4:, :, :] == 20).all()

        gold = tmp_path / "gold"
        pred = tmp_path / "pred"
        gold.mkdir(); pred.mkdir()
        for i in range(3):
            img = np.full((8, 10 + 4 * i), 100 + i, np.uint8)
            Image.fromarray(img).save(gold / f"f{i}.png")
            if i < 2:  # f2 has no pred render -> skipped
                Image.fromarray(img // 2).save(pred / f"f{i}.png")
        out = tmp_path / "sheets"
        n = build_compare_sheets(str(pred), str(gold), str(out))
        assert n == 2
        s0 = np.asarray(Image.open(out / "f0.png"))
        assert s0.shape[0] == 16  # gold stacked above pred
        assert not (out / "f2.png").exists()

        # split: un_match list fans renders into sibling dirs
        renders = tmp_path / "renders"
        renders.mkdir()
        for i in range(4):
            Image.fromarray(np.zeros((4, 4), np.uint8)).save(
                renders / f"f{i}.png"
            )
        lst = tmp_path / "unmatched_filenames.txt"
        lst.write_text("some/dir/f1.png\nf3.png\n")
        counts = split_by_match(str(lst), str(renders))
        assert counts == {"match": 2, "un_match": 2}
        assert sorted(p.name for p in (tmp_path / "un_match").iterdir()) == [
            "f1.png", "f3.png"
        ]
        assert sorted(p.name for p in (tmp_path / "match").iterdir()) == [
            "f0.png", "f2.png"
        ]
        assert renders.exists()  # not deleted without rm_input


class TestSoakArms:
    def test_long_arm_config(self):
        # round-4 long arm = the reference eval contract's regime
        # (config/test.yaml:5: 448x960, batch_max_length 500)
        import sys as _sys, os as _os
        _sys.path.insert(0, _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "tools"))
        from structured_soak import build

        cfg = build(18000, hard=True, family="tfm", big=True, long=True)
        assert cfg["max_dimension"] == [448, 960]
        assert cfg["batch_max_length"] == 500
        assert cfg["batch_size"] == 16
        assert cfg["bucket_growth"] == 4.0
        assert cfg["Prediction"]["name"] == "TFM"
        # and the non-long big arm is unchanged by the overlay
        cfg2 = build(100000, hard=True, family="tfm", big=True)
        assert cfg2["max_dimension"] == [224, 704]
        assert cfg2["batch_max_length"] == 150
        assert cfg2["bucket_growth"] == 2.2
