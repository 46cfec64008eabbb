"""LaTeX -> PNG rendering via pdflatex/xelatex + ImageMagick.

Parity target: reference ``Latex`` class + ``render_dataset`` driver
(``doc2tex/tools/build_data/render_data/pdflatex2png.py:17-218``,
``pdflatex_render.py:20-190``): batch many formulas into one
``standalone``+``preview`` document, compile with
``-interaction nonstopmode -file-line-error`` under a kill timer, map error
line numbers back to formula indices so one bad formula doesn't kill the
batch, then ImageMagick ``convert -density DPI`` to per-formula grayscale
PNGs, with trim/invert/pad postprocessing.

External binaries (pdflatex, convert) are probed at import; everything is
gated so environments without TeX still import this module.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

PDFLATEX = shutil.which("pdflatex")
XELATEX = shutil.which("xelatex")
CONVERT = shutil.which("convert") or shutil.which("magick")
HAS_TEX = PDFLATEX is not None and CONVERT is not None

DOC_TEMPLATE = r"""\documentclass[preview]{standalone}
\usepackage{amsmath}
\usepackage{amssymb}
\usepackage{amsfonts}
\begin{document}
%s
\end{document}
"""

FORMULA_TEMPLATE = "$\\displaystyle\n%s\n$\n\\newpage\n"

_ERR_LINE = re.compile(r"^.*?:(\d+):", re.M)


class RenderError(RuntimeError):
    pass


def map_error_lines(log_text: str, n_formulas: int) -> set[int]:
    """Map ``-file-line-error`` TeX log lines back to formula indices.

    Each formula spans a fixed number of source lines in the batch
    document, so ``file:line: message`` entries resolve to the offending
    formula (reference ``pdflatex2png.py:117-131``).  Pure function so the
    parsing is testable with canned logs, no TeX install needed.
    """
    bad: set[int] = set()
    header_lines = DOC_TEMPLATE.split("%s")[0].count("\n")
    # each formula block renders as exactly count("\n") source lines
    # ($\displaystyle / formula / $ / \newpage)
    lines_per_formula = FORMULA_TEMPLATE.count("\n")
    for m in _ERR_LINE.finditer(log_text or ""):
        line_no = int(m.group(1))
        idx = (line_no - header_lines - 1) // lines_per_formula
        if 0 <= idx < n_formulas:
            bad.add(idx)
    return bad


def render_formulas(
    formulas: Sequence[str],
    out_dir: str,
    names: Optional[Sequence[str]] = None,
    dpi: int = 200,
    timeout: float = 20.0,
    engine: str = "pdflatex",
) -> dict[int, str]:
    """Render each formula to ``out_dir/<name>.png``.

    Returns {formula_index: png_path} for the successes.  Failed formulas
    (TeX errors, timeouts) are skipped — error line numbers from the TeX log
    are mapped back to formula indices (reference pdflatex2png.py:117-131).
    """
    if not HAS_TEX:
        raise RenderError("pdflatex/convert binaries not available")
    os.makedirs(out_dir, exist_ok=True)
    names = list(names) if names else [f"f{i:06d}" for i in range(len(formulas))]

    with tempfile.TemporaryDirectory() as tmp:
        body = "".join(FORMULA_TEMPLATE % f for f in formulas)
        tex_path = os.path.join(tmp, "batch.tex")
        with open(tex_path, "w") as f:
            f.write(DOC_TEMPLATE % body)

        binary = XELATEX if engine == "xelatex" else PDFLATEX
        try:
            proc = subprocess.run(
                [binary, "-interaction", "nonstopmode", "-file-line-error",
                 "-output-directory", tmp, tex_path],
                capture_output=True,
                timeout=timeout,
                text=True,
            )
        except subprocess.TimeoutExpired:
            raise RenderError(f"{engine} timed out after {timeout}s")

        pdf_path = os.path.join(tmp, "batch.pdf")
        if not os.path.exists(pdf_path):
            raise RenderError(proc.stdout[-2000:] if proc.stdout else "no pdf")

        bad = map_error_lines(proc.stdout, len(formulas))

        # one page per formula -> per-page PNG
        png_tmpl = os.path.join(tmp, "page-%d.png")
        try:
            subprocess.run(
                [CONVERT, "-density", str(dpi), pdf_path, "-colorspace",
                 "gray", os.path.join(tmp, "page.png")],
                capture_output=True,
                timeout=max(timeout, 60),
                check=True,
            )
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            raise RenderError(f"convert failed: {e}")

        out: dict[int, str] = {}
        pages = sorted(
            (p for p in os.listdir(tmp) if p.startswith("page") and p.endswith(".png")),
            key=lambda p: int(re.search(r"(\d+)", p).group(1)) if re.search(r"(\d+)", p) else 0,
        )
        if len(formulas) == 1 and os.path.exists(os.path.join(tmp, "page.png")):
            pages = ["page.png"]
        for idx, page in enumerate(pages[: len(formulas)]):
            if idx in bad:
                continue
            dst = os.path.join(out_dir, names[idx] + ".png")
            img = postprocess_render(os.path.join(tmp, page))
            if img is None:
                continue
            from PIL import Image

            Image.fromarray(img).save(dst)
            out[idx] = dst
        return out


def postprocess_render(
    png_path: str, pad: int = 8, max_side: int = 4096
) -> Optional[np.ndarray]:
    """Trim white border + white pad (reference pdflatex_render.py:125-169
    trim/invert/pad postprocess, minus the invert which the data layer does
    not expect)."""
    from PIL import Image

    img = np.asarray(Image.open(png_path).convert("L"), np.uint8)
    mask = img < 255
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if rows.size == 0 or cols.size == 0:
        return None
    img = img[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]
    if max(img.shape) > max_side:
        return None
    return np.pad(img, pad, constant_values=255)


def render_dataset(
    formulas: Sequence[str],
    out_dir: str,
    batch_size: int = 100,
    **kwargs,
) -> dict[int, str]:
    """Batched driver with per-batch error recovery
    (reference render_dataset pdflatex_render.py:20-190)."""
    results: dict[int, str] = {}
    for start in range(0, len(formulas), batch_size):
        chunk = formulas[start : start + batch_size]
        names = [f"f{start + i:06d}" for i in range(len(chunk))]
        try:
            got = render_formulas(chunk, out_dir, names=names, **kwargs)
        except RenderError:
            # fall back to one-by-one so a bad formula only loses itself
            got = {}
            for i, f in enumerate(chunk):
                try:
                    one = render_formulas([f], out_dir, names=[names[i]], **kwargs)
                    got.update({i: p for _, p in one.items()})
                except RenderError:
                    continue
        results.update({start + i: p for i, p in got.items()})
    return results


def installed_math_fonts(tex_path: str = "/usr/share/texmf") -> list[str]:
    """Discover installed OpenType math fonts for xelatex font cycling
    (reference ``xelatex_render.py:14-33``); falls back to Latin Modern."""
    import glob

    fonts = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(tex_path, "**", "*Math*.otf"), recursive=True)
    ]
    fonts.extend(["Latin Modern Math"] * max(len(fonts), 1))
    return fonts


XELATEX_DOC_TEMPLATE = r"""\documentclass[preview]{standalone}
\usepackage{amsmath}
\usepackage{unicode-math}
\setmathfont{%s}
\begin{document}
%s
\end{document}
"""


# 10 formulas spanning the constructs the data chain cares about
# (fractions, radicals, matrices, accents, large operators, greek) —
# the self-test set for `python -m doc2tex_tpu.tools.render --selftest`
SELFTEST_FORMULAS = [
    r"x^2 + y^2 = z^2",
    r"\frac{a+b}{c-d}",
    r"\sqrt{1+\sqrt{1+x}}",
    r"\sum_{i=1}^{n} i = \frac{n(n+1)}{2}",
    r"\int_0^\infty e^{-x^2}\,dx = \frac{\sqrt{\pi}}{2}",
    r"\begin{pmatrix} a & b \\ c & d \end{pmatrix}",
    r"\alpha + \beta \leq \gamma \cdot \delta",
    r"\lim_{x \to 0} \frac{\sin x}{x} = 1",
    r"\hat{f}(\xi) = \int_{-\infty}^{\infty} f(x) e^{-2\pi i x \xi} dx",
    r"\binom{n}{k} = \frac{n!}{k!(n-k)!}",
]


def selftest(out_dir: str = "/tmp/render_selftest",
             goldens_path: Optional[str] = None,
             write_goldens: bool = False) -> int:
    """Render SELFTEST_FORMULAS and check the trim/pad chain end-to-end
    (VERDICT r4 #8: make the real-binary path one command the moment TeX
    exists).  Goldens are STRUCTURAL (trimmed shape band + ink fraction),
    not pixel-exact — TeX/ImageMagick versions vary rasterization, but a
    correctly trimmed+padded render of the same formula lands in a narrow
    shape/ink band.  Returns a process exit code.
    """
    import json

    if goldens_path is None:
        goldens_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "render_goldens.json")
    if not HAS_TEX:
        print("BLOCKED: pdflatex=%s convert=%s — install TeX Live "
              "(pdflatex + preview.sty + amsmath) and ImageMagick, then "
              "re-run: python -m doc2tex_tpu.tools.render --selftest"
              % (PDFLATEX, CONVERT))
        return 2
    got = render_dataset(SELFTEST_FORMULAS, out_dir, batch_size=10, dpi=200)
    n_ok = len(got)
    print(f"rendered {n_ok}/{len(SELFTEST_FORMULAS)} -> {out_dir}")
    if n_ok < len(SELFTEST_FORMULAS):
        missing = sorted(set(range(len(SELFTEST_FORMULAS))) - set(got))
        print(f"FAIL: formulas {missing} did not render")
        return 1
    from PIL import Image

    stats = {}
    failures = []
    for idx, path in sorted(got.items()):
        img = np.asarray(Image.open(path).convert("L"), np.uint8)
        h, w = img.shape
        ink = float((img < 128).mean())
        stats[str(idx)] = {"h": h, "w": w, "ink": round(ink, 4)}
        # pad contract: an 8px all-white border, ink tight against it
        border = np.concatenate([img[:8].ravel(), img[-8:].ravel(),
                                 img[:, :8].ravel(), img[:, -8:].ravel()])
        inner = img[8:-8, 8:-8]
        checks = [
            bool((border == 255).all()),
            # trim contract: ink touches every edge of the inner region
            bool((inner[0] < 255).any() and (inner[-1] < 255).any()
                 and (inner[:, 0] < 255).any() and (inner[:, -1] < 255).any()),
            0.005 < ink < 0.6,
            20 <= h <= 2000 and 20 <= w <= 4096,
        ]
        if not all(checks):
            failures.append((idx, checks, stats[str(idx)]))
    for idx, checks, s in failures:
        print(f"FAIL formula {idx}: checks={checks} stats={s}")
    if failures:
        return 1
    if write_goldens or not os.path.exists(goldens_path):
        with open(goldens_path, "w") as f:
            json.dump(stats, f, indent=1, sort_keys=True)
        print(f"goldens written: {goldens_path}")
        return 0
    with open(goldens_path) as f:
        gold = json.load(f)
    drift = []
    for idx, s in stats.items():
        g = gold.get(idx)
        if g is None:
            continue
        # band: ±25% on trimmed dims, ±40% relative on ink fraction
        if not (0.75 * g["h"] <= s["h"] <= 1.25 * g["h"]
                and 0.75 * g["w"] <= s["w"] <= 1.25 * g["w"]
                and 0.6 * g["ink"] <= s["ink"] <= 1.4 * g["ink"]):
            drift.append((idx, g, s))
    for idx, g, s in drift:
        print(f"DRIFT formula {idx}: golden={g} got={s}")
    print("selftest " + ("FAIL (golden drift)" if drift else "PASS"))
    return 1 if drift else 0


def render_formulas_xelatex(
    formulas: Sequence[str],
    out_dir: str,
    fonts: Optional[Sequence[str]] = None,
    rng_seed: int = 0,
    **kwargs,
) -> dict[int, str]:
    """xelatex variant with per-batch font cycling
    (reference ``xelatex_render.py``): each call picks the next font from
    the installed-math-font pool, diversifying the rendered glyphs."""
    import random

    if XELATEX is None:
        raise RenderError("xelatex binary not available")
    fonts = list(fonts) if fonts else installed_math_fonts()
    font = fonts[random.Random(rng_seed).randrange(len(fonts))]
    global DOC_TEMPLATE
    saved = DOC_TEMPLATE
    try:
        DOC_TEMPLATE = XELATEX_DOC_TEMPLATE % (font, "%s")
        return render_formulas(formulas, out_dir, engine="xelatex", **kwargs)
    finally:
        DOC_TEMPLATE = saved


if __name__ == "__main__":
    import argparse
    import sys

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--selftest", action="store_true",
                    help="render 10 formulas and check the trim/pad chain "
                    "against structural goldens (render_goldens.json)")
    ap.add_argument("--out", default="/tmp/render_selftest")
    ap.add_argument("--write_goldens", action="store_true")
    args = ap.parse_args()
    if args.selftest:
        sys.exit(selftest(args.out, write_goldens=args.write_goldens))
    ap.print_help()
