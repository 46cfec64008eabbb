"""Synthetic formula dataset for tests and benchmarking.

The reference has no in-repo dataset or vocab; its data comes from an arXiv
scrape + render pipeline.  For hermetic tests and benches we generate
deterministic grayscale "formula-like" images (random black glyph boxes on a
white canvas) with token labels drawn from a small LaTeX-ish vocabulary.
Statistics (white background, dark ink, wide aspect ratios, token lengths)
match the real domain closely enough to exercise every code path.
"""

from __future__ import annotations

import numpy as np

# A compact LaTeX-flavored vocabulary for synthetic data.
SYNTH_VOCAB: list[str] = (
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
    + [
        "\\frac", "\\sqrt", "\\sum", "\\int", "\\alpha", "\\beta", "\\gamma",
        "\\cdot", "\\times", "\\partial", "\\infty", "\\left(", "\\right)",
        "{", "}", "^", "_", "+", "-", "=", "(", ")", "[", "]", "|",
    ]
    # structured-grammar extension (round 2): real-vocab command inventory
    # for the nested frac/sqrt/script/matrix generator below
    + [
        "\\begin{matrix}", "\\end{matrix}", "\\\\", "&",
        "\\pi", "\\sigma", "\\mu", "\\lambda", "\\theta", "\\phi",
        "\\psi", "\\omega", "\\delta", "\\epsilon", "\\rho", "\\tau",
        "\\leq", "\\geq", "\\neq", "\\pm", "\\to", "\\prod", "\\lim",
        "\\log", "\\sin", "\\cos", "\\exp", "\\nabla", "\\langle",
        "\\rangle", ",", ".", "/", "!", "<", ">",
    ]
)


def make_vocab_file(path: str) -> list[str]:
    with open(path, "w", encoding="utf-8") as f:
        for t in SYNTH_VOCAB:
            f.write(t + "\n")
    return list(SYNTH_VOCAB)


_GLYPH_CACHE: dict[int, np.ndarray] = {}
_GLYPH_H, _GLYPH_W = 12, 8


def _token_glyph(token_id: int) -> np.ndarray:
    """Deterministic binary glyph for a token id (12x8).

    Each token renders as a unique, stable pixel pattern, so the label IS
    decodable from the image — synthetic training can reach ~100% exact
    match, which is what makes convergence tests meaningful."""
    g = _GLYPH_CACHE.get(token_id)
    if g is None:
        rng = np.random.default_rng(1000 + token_id)
        g = (rng.random((_GLYPH_H, _GLYPH_W)) < 0.45).astype(np.uint8)
        g[0, :] = 1  # top bar anchors vertical alignment
        _GLYPH_CACHE[token_id] = g
    return g


def synth_sample(
    rng: np.random.Generator,
    min_len: int = 3,
    max_len: int = 40,
    min_h: int = 24,
    max_h: int = 120,
) -> tuple[np.ndarray, str]:
    """One (image, label) pair: uint8 (H, W) white background with one
    deterministic dark glyph per token laid out left-to-right (plus random
    scale/offset jitter), widths scaling with token count like rendered
    formulas."""
    n_tok = int(rng.integers(min_len, max_len + 1))
    tok_ids = [int(rng.integers(len(SYNTH_VOCAB))) for _ in range(n_tok)]
    toks = [SYNTH_VOCAB[i] for i in tok_ids]
    h = int(rng.integers(min_h, max_h + 1))
    # glyph scale fits the canvas height with jitter; floor of 2 when the
    # canvas allows it so glyphs stay above the encoder's /16 height stride
    # (12px glyphs are sub-resolution for the FAN ResNet)
    hi = max(h // _GLYPH_H, 2)
    lo = 2 if hi > 2 else 1
    scale = max(int(rng.integers(lo, hi + 1)), 1)
    gh, gw = _GLYPH_H * scale, _GLYPH_W * scale
    gap = int(rng.integers(1, 4)) * scale // 2 + 1
    w = int(np.clip(n_tok * (gw + gap) + 2 * gap + int(rng.integers(0, 20)), 32, 900))
    img = np.full((h, w), 255, dtype=np.uint8)
    y0 = int(rng.integers(0, max(h - gh, 1)))
    ink = int(rng.integers(0, 60))
    x = gap
    for tid in tok_ids:
        if x + gw > w:
            break
        glyph = np.kron(_token_glyph(tid), np.ones((scale, scale), np.uint8))
        region = img[y0 : y0 + gh, x : x + gw]
        region[glyph[: region.shape[0], : region.shape[1]] > 0] = ink
        x += gw + gap
    return img, " ".join(toks)


def synth_dataset(
    n: int, seed: int = 0, **kwargs
) -> tuple[list[np.ndarray], list[str]]:
    rng = np.random.default_rng(seed)
    images, labels = [], []
    for _ in range(n):
        img, label = synth_sample(rng, **kwargs)
        images.append(img)
        labels.append(label)
    return images, labels


# ---------------------------------------------------------------------------
# Structured-LaTeX grammar (round-2 hardening, VERDICT item #5)
#
# The flat generator above has no token co-occurrence structure; rendered
# LaTeX does.  This generator samples a small expression grammar (nested
# \frac / \sqrt / ^ / _ / matrix environments over the real vocab
# inventory), renders it in 2D (stacked fractions with bars, radical
# hooks, raised/lowered scripts, matrix grids), and emits the canonical
# brace-explicit token string — so labels remain exactly decodable from
# pixels while image statistics (variable height, nesting, 2D layout)
# approach rendered formulas.

_STRUCT_SYMBOLS = [
    t for t in SYNTH_VOCAB
    if t not in {
        "\\frac", "\\sqrt", "{", "}", "^", "_",
        "\\begin{matrix}", "\\end{matrix}", "\\\\", "&",
        # emitted only as a balanced pair (delims production) so every
        # generated label is valid LaTeX under latex/validate.py
        "\\left(", "\\right)",
    }
]
_WHITE = 255


def _glyph_img(token: str, scale: int, ink: int) -> np.ndarray:
    g = _token_glyph(SYNTH_VOCAB.index(token))
    g = np.kron(g, np.ones((scale, scale), np.uint8))
    img = np.full(g.shape, _WHITE, np.uint8)
    img[g > 0] = ink
    return img


def _hstack(parts: list[np.ndarray], gap: int) -> np.ndarray:
    """Concatenate horizontally, centering each part vertically."""
    h = max(p.shape[0] for p in parts)
    w = sum(p.shape[1] for p in parts) + gap * (len(parts) - 1)
    out = np.full((h, w), _WHITE, np.uint8)
    x = 0
    for p in parts:
        y = (h - p.shape[0]) // 2
        out[y : y + p.shape[0], x : x + p.shape[1]] = p
        x += p.shape[1] + gap
    return out


class _StructGen:
    def __init__(self, rng: np.random.Generator, scale: int, ink: int,
                 max_tokens: int, max_depth: int = 3):
        self.rng = rng
        self.s = scale
        self.ink = ink
        self.budget = max_tokens
        self.max_depth = max_depth

    def _sym(self) -> tuple[np.ndarray, list[str]]:
        t = _STRUCT_SYMBOLS[int(self.rng.integers(len(_STRUCT_SYMBOLS)))]
        self.budget -= 1
        return _glyph_img(t, self.s, self.ink), [t]

    def atom(self, depth: int) -> tuple[np.ndarray, list[str]]:
        r = self.rng.random()
        deep_ok = depth < self.max_depth and self.budget >= 6
        if deep_ok and r < 0.12:
            return self.frac(depth)
        if deep_ok and r < 0.18:
            return self.sqrt(depth)
        if deep_ok and r < 0.34:
            return self.script(depth)
        if deep_ok and r < 0.38:
            return self.delims(depth)
        if deep_ok and depth == 0 and r < 0.42 and self.budget >= 10:
            return self.matrix(depth)
        return self._sym()

    def expr(self, depth: int, max_atoms: int) -> tuple[np.ndarray, list[str]]:
        n = int(self.rng.integers(1, max_atoms + 1))
        imgs, toks = [], []
        for _ in range(n):
            if self.budget <= 0:
                break
            i, t = self.atom(depth)
            imgs.append(i)
            toks.extend(t)
        if not imgs:
            i, t = self._sym()
            imgs, toks = [i], t
        return _hstack(imgs, gap=self.s), toks

    def frac(self, depth: int) -> tuple[np.ndarray, list[str]]:
        self.budget -= 5  # \frac { } { }
        num, nt = self.expr(depth + 1, 3)
        den, dt = self.expr(depth + 1, 3)
        w = max(num.shape[1], den.shape[1]) + 2 * self.s
        bar = np.full((max(self.s // 2, 2), w), self.ink, np.uint8)
        gap = np.full((self.s, w), _WHITE, np.uint8)

        def center(p):
            out = np.full((p.shape[0], w), _WHITE, np.uint8)
            x = (w - p.shape[1]) // 2
            out[:, x : x + p.shape[1]] = p
            return out

        img = np.concatenate(
            [center(num), gap, bar, gap, center(den)], axis=0
        )
        return img, ["\\frac", "{", *nt, "}", "{", *dt, "}"]

    def sqrt(self, depth: int) -> tuple[np.ndarray, list[str]]:
        self.budget -= 3  # \sqrt { }
        body, bt = self.expr(depth + 1, 3)
        bar_h = max(self.s // 2, 2)
        hook_w = 2 * self.s
        h = body.shape[0] + bar_h + self.s
        w = body.shape[1] + hook_w + self.s
        img = np.full((h, w), _WHITE, np.uint8)
        img[bar_h + self.s :, hook_w : hook_w + body.shape[1]] = body
        img[:bar_h, hook_w - self.s :] = self.ink       # top bar
        # diagonal hook
        for k in range(h):
            x = int(hook_w * k / h)
            img[h - 1 - k, max(x - bar_h, 0) : x + 1] = self.ink
        return img, ["\\sqrt", "{", *bt, "}"]

    def script(self, depth: int) -> tuple[np.ndarray, list[str]]:
        base, bt = self._sym()
        which = "^" if self.rng.random() < 0.5 else "_"
        self.budget -= 3  # ^ { }
        sup, st = self.expr(depth + 1, 2)
        bh, bw = base.shape
        sh, sw = sup.shape
        # enough rows for the raised/lowered script even when the script
        # subtree is taller than the base glyph
        h = max(bh + sh // 2 + self.s, sh + self.s)
        w = bw + sw + self.s
        img = np.full((h, w), _WHITE, np.uint8)
        if which == "^":
            img[h - bh :, :bw] = base
            img[: sh, bw + self.s :] = sup
        else:
            img[:bh, :bw] = base
            img[h - sh :, bw + self.s :] = sup
        return img, [*bt, which, "{", *st, "}"]

    def delims(self, depth: int) -> tuple[np.ndarray, list[str]]:
        """Balanced \\left( ... \\right) pair around a sub-expression."""
        self.budget -= 2
        body, bt = self.expr(depth + 1, 3)
        left = _glyph_img("\\left(", self.s, self.ink)
        right = _glyph_img("\\right)", self.s, self.ink)
        img = _hstack([left, body, right], gap=self.s)
        return img, ["\\left(", *bt, "\\right)"]

    def matrix(self, depth: int) -> tuple[np.ndarray, list[str]]:
        rows = int(self.rng.integers(2, 4))
        cols = int(self.rng.integers(2, 4))
        self.budget -= rows * cols + 2
        cells = [
            [self.expr(depth + 1, 2) for _ in range(cols)]
            for _ in range(rows)
        ]
        col_w = [
            max(cells[r][c][0].shape[1] for r in range(rows))
            for c in range(cols)
        ]
        row_h = [
            max(cells[r][c][0].shape[0] for c in range(cols))
            for r in range(rows)
        ]
        gap = 2 * self.s
        h = sum(row_h) + gap * (rows - 1)
        w = sum(col_w) + gap * (cols - 1)
        img = np.full((h, w), _WHITE, np.uint8)
        toks = ["\\begin{matrix}"]
        y = 0
        for r in range(rows):
            x = 0
            for c in range(cols):
                p, t = cells[r][c]
                img[y + (row_h[r] - p.shape[0]) // 2 :, x :][
                    : p.shape[0], : p.shape[1]
                ] = p
                if toks[-1] == "\\\\" and t and t[0] == "[":
                    # "\\ [" would parse as the row break's optional size
                    # argument (KaTeX cr function); brace the cell
                    t = ["{", *t, "}"]
                toks.extend(t)
                if c < cols - 1:
                    toks.append("&")
                x += col_w[c] + gap
            if r < rows - 1:
                toks.append("\\\\")
            y += row_h[r] + gap
        toks.append("\\end{matrix}")
        return img, toks


def synth_structured_sample(
    rng: np.random.Generator,
    min_len: int = 3,
    max_len: int = 40,
    max_h: int = 256,
    max_w: int = 900,
) -> tuple[np.ndarray, str]:
    """One structured (image, label): nested LaTeX layout, exact labels.

    Oversized renders are REgenerated with a halved token budget rather
    than clipped — clipping would cut pixels off while the label kept the
    lost tokens, breaking the decodable-label contract (and capping EM).
    """
    budget = int(rng.integers(min_len, max_len + 1))
    for _ in range(8):
        scale = int(rng.integers(2, 4))
        ink = int(rng.integers(0, 60))
        gen = _StructGen(rng, scale, ink, max_tokens=budget)
        img, toks = gen.expr(0, max_atoms=8)
        pad = int(rng.integers(2, 8))
        img = np.pad(img, pad, constant_values=_WHITE)
        if img.shape[0] <= max_h and img.shape[1] <= max_w:
            break
        budget = max(budget // 2, min_len)
    else:  # guaranteed-small fallback: symbols only at min scale
        gen = _StructGen(rng, 2, 0, max_tokens=min_len, max_depth=0)
        img, toks = gen.expr(0, max_atoms=min_len)
        img = np.pad(img, 4, constant_values=_WHITE)
    h = max(img.shape[0], 24)
    w = max(img.shape[1], 32)
    canvas = np.full((h, w), _WHITE, np.uint8)
    canvas[: img.shape[0], : img.shape[1]] = img
    return canvas, " ".join(toks)


def synth_structured_dataset(
    n: int, seed: int = 0, **kwargs
) -> tuple[list[np.ndarray], list[str]]:
    rng = np.random.default_rng(seed)
    images, labels = [], []
    for _ in range(n):
        img, label = synth_structured_sample(rng, **kwargs)
        images.append(img)
        labels.append(label)
    return images, labels
