"""Vocabulary loading and construction.

Reference parity: vocab files are newline-separated token lists loaded into
``config['character']`` (reference ``doc2tex/modules/converter/builder.py:5-12``);
vocab *construction* (frequency counting + UNK threshold) mirrors
``doc2tex/tools/build_data/construct_label/generate_latex_vocab.py:60-155``.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Sequence


def load_vocab(path: str) -> list[str]:
    """Load a newline-separated token vocabulary file."""
    with open(path, "r", encoding="utf-8") as f:
        tokens = [line.rstrip("\n") for line in f]
    return [t for t in tokens if t]


def save_vocab(tokens: Sequence[str], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for t in tokens:
            f.write(t + "\n")


def build_vocab(
    token_lines: Iterable[Sequence[str]],
    min_freq: int = 1,
    max_size: int | None = None,
) -> list[str]:
    """Build a frequency-sorted vocabulary from tokenized formula lines.

    Tokens below ``min_freq`` are dropped (they map to [UNK] at encode time),
    replicating the UNK-threshold behavior of the reference vocab builder.
    Ties are broken lexicographically for determinism.
    """
    counter: Counter[str] = Counter()
    for toks in token_lines:
        counter.update(toks)
    items = [(t, c) for t, c in counter.items() if c >= min_freq]
    items.sort(key=lambda tc: (-tc[1], tc[0]))
    if max_size is not None:
        items = items[:max_size]
    return [t for t, _ in items]
