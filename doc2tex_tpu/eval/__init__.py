from .metrics import (
    bleu_score,
    get_single_ED,
    get_word_NED,
    exact_match,
    levenshtein,
)

__all__ = [
    "bleu_score",
    "get_single_ED",
    "get_word_NED",
    "exact_match",
    "levenshtein",
]
