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


def synth_sample(
    rng: np.random.Generator,
    min_len: int = 3,
    max_len: int = 40,
    min_h: int = 24,
    max_h: int = 120,
) -> tuple[np.ndarray, str]:
    """One (image, label) pair.  Image is uint8 (H, W), white bg, dark ink
    blobs; width loosely scales with token count like rendered formulas."""
    n_tok = int(rng.integers(min_len, max_len + 1))
    toks = [SYNTH_VOCAB[int(rng.integers(len(SYNTH_VOCAB)))] for _ in range(n_tok)]
    h = int(rng.integers(min_h, max_h + 1))
    w = int(np.clip(n_tok * rng.integers(8, 20) + rng.integers(0, 30), 32, 900))
    img = np.full((h, w), 255, dtype=np.uint8)
    # draw one dark blob per token
    for i in range(n_tok):
        cx = int((i + 0.5) / n_tok * w)
        bw = int(rng.integers(3, 10))
        bh = int(rng.integers(h // 4, max(h // 2, h // 4 + 1)))
        y0 = int(rng.integers(0, max(h - bh, 1)))
        x0 = max(cx - bw // 2, 0)
        img[y0 : y0 + bh, x0 : x0 + bw] = rng.integers(0, 80)
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
