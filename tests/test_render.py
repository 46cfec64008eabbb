"""Renderer log-recovery tests without a TeX install (VERDICT item #7).

Covers: canned ``-file-line-error`` log parsing against the real batch
document structure, multi-error batches, the full render_formulas flow
via fake pdflatex/convert binaries, and the kill-timer path.
"""

import os
import stat
import sys

import numpy as np
import pytest

from doc2tex_tpu.tools import render
from doc2tex_tpu.tools.render import (
    DOC_TEMPLATE,
    FORMULA_TEMPLATE,
    RenderError,
    map_error_lines,
)


def build_doc(formulas):
    return DOC_TEMPLATE % "".join(FORMULA_TEMPLATE % f for f in formulas)


def formula_line(formulas, idx):
    """1-based source line of formula ``idx``'s content in the batch doc."""
    doc = build_doc(formulas)
    lines = doc.split("\n")
    hits = [i + 1 for i, ln in enumerate(lines) if ln == formulas[idx]]
    assert hits, f"formula {idx} not found as its own line"
    return hits[idx if len(hits) > 1 else 0]


class TestErrorLineMapping:
    FORMULAS = [f"x_{i} + y^{i}" for i in range(8)]

    @pytest.mark.parametrize("idx", [0, 1, 2, 3, 7])
    def test_single_error_maps_to_its_formula(self, idx):
        # craft the log line pdflatex -file-line-error emits for an error
        # at the exact source line where formula `idx` sits
        line = formula_line(self.FORMULAS, idx)
        log = f"./batch.tex:{line}: Undefined control sequence.\n"
        assert map_error_lines(log, len(self.FORMULAS)) == {idx}

    def test_error_on_block_edges(self):
        # errors reported on the $\displaystyle / $ / \newpage lines of a
        # block still resolve to that block's formula
        base = formula_line(self.FORMULAS, 3)
        for off in (-1, 0, 1, 2):
            log = f"./batch.tex:{base + off}: Missing $ inserted.\n"
            assert map_error_lines(log, len(self.FORMULAS)) == {3}, off

    def test_multi_error_batch(self):
        lines = [formula_line(self.FORMULAS, i) for i in (1, 4, 6)]
        log = "".join(
            f"./batch.tex:{ln}: LaTeX Error: something.\n" for ln in lines
        )
        log = "irrelevant noise\n" + log + "more noise :not-a-line:\n"
        assert map_error_lines(log, len(self.FORMULAS)) == {1, 4, 6}

    def test_out_of_range_lines_ignored(self):
        log = "./batch.tex:99999: error\n./batch.tex:1: preamble error\n"
        assert map_error_lines(log, 3) == set()

    def test_empty_log(self):
        assert map_error_lines("", 5) == set()
        assert map_error_lines(None, 5) == set()


def _write_script(path, body):
    with open(path, "w") as f:
        f.write(f"#!{sys.executable}\n{body}")
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


@pytest.fixture
def fake_tex(tmp_path, monkeypatch):
    """Stub pdflatex/convert binaries driving the real render flow."""
    n_pages = 4
    err_line = formula_line([f"f{i}" for i in range(n_pages)], 2)
    pdflatex = _write_script(
        str(tmp_path / "pdflatex"),
        f"""
import sys, os
out = sys.argv[sys.argv.index('-output-directory') + 1]
open(os.path.join(out, 'batch.pdf'), 'wb').write(b'%PDF-fake')
print('./batch.tex:{err_line}: Undefined control sequence.')
""",
    )
    convert = _write_script(
        str(tmp_path / "convert"),
        f"""
import sys, os
import numpy as np
from PIL import Image
out = sys.argv[-1]           # .../page.png
tmp = os.path.dirname(out)
img = np.full((20, 30), 255, np.uint8); img[5:15, 5:25] = 0
for i in range({n_pages}):
    Image.fromarray(img).save(os.path.join(tmp, 'page-%d.png' % i))
""",
    )
    sleeper = _write_script(
        str(tmp_path / "pdflatex_slow"), "import time\ntime.sleep(30)\n"
    )
    monkeypatch.setattr(render, "PDFLATEX", pdflatex)
    monkeypatch.setattr(render, "CONVERT", convert)
    monkeypatch.setattr(render, "HAS_TEX", True)
    return {"sleeper": sleeper, "n_pages": n_pages}


class TestRenderFlowWithFakeBinaries:
    def test_bad_formula_skipped_others_rendered(self, fake_tex, tmp_path):
        out_dir = str(tmp_path / "out")
        formulas = [f"f{i}" for i in range(fake_tex["n_pages"])]
        got = render.render_formulas(formulas, out_dir)
        # formula 2 errored in the canned log -> skipped; others rendered
        assert sorted(got) == [0, 1, 3]
        for idx, path in got.items():
            assert os.path.exists(path)

    def test_kill_timer(self, fake_tex, tmp_path, monkeypatch):
        monkeypatch.setattr(render, "PDFLATEX", fake_tex["sleeper"])
        with pytest.raises(RenderError, match="timed out"):
            render.render_formulas(["x"], str(tmp_path / "out"), timeout=1.0)

    def test_render_dataset_survives_batch_failure(
        self, fake_tex, tmp_path, monkeypatch
    ):
        # whole-batch RenderError -> per-formula fallback, which also fails
        # here; the driver must return partial results, not raise
        monkeypatch.setattr(render, "PDFLATEX", fake_tex["sleeper"])
        got = render.render_dataset(["a", "b"], str(tmp_path / "out"), timeout=0.5)
        assert got == {}


class TestPostprocess:
    def test_trim_and_pad(self, tmp_path):
        from PIL import Image

        img = np.full((40, 60), 255, np.uint8)
        img[10:20, 15:35] = 0
        p = str(tmp_path / "x.png")
        Image.fromarray(img).save(p)
        out = render.postprocess_render(p, pad=8)
        assert out.shape == (10 + 16, 20 + 16)
        assert (out[:8] == 255).all()

    def test_blank_page_rejected(self, tmp_path):
        from PIL import Image

        p = str(tmp_path / "blank.png")
        Image.fromarray(np.full((30, 30), 255, np.uint8)).save(p)
        assert render.postprocess_render(p) is None


@pytest.fixture
def fake_tex_clean(tmp_path, monkeypatch):
    """Fakes that render ALL selftest formulas cleanly (no error lines)."""
    n = len(render.SELFTEST_FORMULAS)
    pdflatex = _write_script(
        str(tmp_path / "pdflatex"),
        """
import sys, os
out = sys.argv[sys.argv.index('-output-directory') + 1]
open(os.path.join(out, 'batch.pdf'), 'wb').write(b'%PDF-fake')
""",
    )
    convert = _write_script(
        str(tmp_path / "convert"),
        f"""
import sys, os
import numpy as np
from PIL import Image
out = sys.argv[-1]
tmp = os.path.dirname(out)
img = np.full((20, 30), 255, np.uint8); img[5:15, 5:25] = 0
for i in range({n}):
    Image.fromarray(img).save(os.path.join(tmp, 'page-%d.png' % i))
""",
    )
    monkeypatch.setattr(render, "PDFLATEX", pdflatex)
    monkeypatch.setattr(render, "CONVERT", convert)
    monkeypatch.setattr(render, "HAS_TEX", True)


class TestSelftest:
    def test_blocked_without_tex(self, monkeypatch, tmp_path):
        monkeypatch.setattr(render, "HAS_TEX", False)
        assert render.selftest(str(tmp_path / "o")) == 2

    def test_writes_goldens_then_passes(self, fake_tex_clean, tmp_path):
        goldens = str(tmp_path / "goldens.json")
        # first run writes structural goldens
        assert render.selftest(str(tmp_path / "o"), goldens_path=goldens) == 0
        assert os.path.exists(goldens)
        # second run compares against them and passes (same fakes)
        assert render.selftest(str(tmp_path / "o2"), goldens_path=goldens) == 0

    def test_golden_drift_fails(self, fake_tex_clean, tmp_path):
        import json

        goldens = str(tmp_path / "goldens.json")
        assert render.selftest(str(tmp_path / "o"), goldens_path=goldens) == 0
        with open(goldens) as f:
            gold = json.load(f)
        gold["0"]["h"] = gold["0"]["h"] * 3  # out of the ±25% band
        with open(goldens, "w") as f:
            json.dump(gold, f)
        assert render.selftest(str(tmp_path / "o2"), goldens_path=goldens) == 1
