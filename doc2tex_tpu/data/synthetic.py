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
