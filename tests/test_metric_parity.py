"""Metric parity vs the reference implementations (run in place)."""

import os
import sys

import numpy as np
import pytest

REFERENCE = os.environ.get("DOC2TEX_REFERENCE", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(REFERENCE):
    pytest.skip("reference repo not mounted", allow_module_level=True)
sys.path.insert(0, REFERENCE)

from doc2tex_tpu.eval.metrics import bleu_score, get_single_ED, get_word_NED


def _rand_tokens(rng, lo=1, hi=25):
    vocab = ["a", "b", "c", "\\frac", "{", "}", "x", "y", "+", "-", "2"]
    return [vocab[int(rng.integers(len(vocab)))] for _ in range(int(rng.integers(lo, hi)))]


class TestBleuParity:
    def test_corpus_bleu_matches_reference(self):
        from doc2tex.modules.metrics.bleu import bleu_score as ref_bleu

        rng = np.random.default_rng(0)
        cands = [_rand_tokens(rng) for _ in range(20)]
        # half the refs share a prefix with the candidate (realistic overlap)
        refs = [[c[: max(len(c) // 2, 1)] + _rand_tokens(rng, 1, 8)] for c in cands]
        ours = bleu_score(cands, refs)
        theirs = float(ref_bleu(cands, refs))
        assert abs(ours - theirs) < 1e-6, (ours, theirs)

    def test_perfect_and_zero(self):
        from doc2tex.modules.metrics.bleu import bleu_score as ref_bleu

        cands = [["a", "b", "c", "d", "e"]]
        refs = [[["a", "b", "c", "d", "e"]]]
        assert abs(bleu_score(cands, refs) - float(ref_bleu(cands, refs))) < 1e-9


class TestEDParity:
    def test_char_ned_matches_reference(self):
        from doc2tex.modules.metrics.ed import get_single_ED as ref_ed

        rng = np.random.default_rng(1)
        for _ in range(20):
            gt = " ".join(_rand_tokens(rng))
            pred = " ".join(_rand_tokens(rng))
            assert abs(get_single_ED(gt, pred) - ref_ed(gt, pred)) < 1e-9

    def test_word_ned_matches_reference(self):
        from doc2tex.modules.metrics.ed import get_word_NED as ref_wned

        rng = np.random.default_rng(2)
        gts = [" ".join(_rand_tokens(rng)) for _ in range(10)]
        preds = [" ".join(_rand_tokens(rng)) for _ in range(10)]
        assert abs(get_word_NED(preds, gts) - float(ref_wned(preds, gts))) < 1e-9
