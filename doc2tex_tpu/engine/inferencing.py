"""Validation: teacher-forced loss + on-device greedy decode + token metrics.

Parity target: reference ``validation_step`` / ``validation``
(``doc2tex/engine/inferencing.py:12-131``, ``doc2tex/engine/
training.py:167-320``): per-batch loss, decode, exact-match accuracy,
char/word NED, corpus BLEU, worst-predictions list, optional CSV export.

TPU-native: decode is the batched jitted greedy pipeline (one program per
bucket shape) instead of per-token Python loops.
"""

from __future__ import annotations

import csv
import os
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from ..decode.runner import make_decode_fn
from ..eval.metrics import bleu_score, get_single_ED, get_word_NED
from ..utils import Averager


def _strip(pred_tokens: list[str]) -> str:
    return " ".join(pred_tokens)


def validation(
    model,
    state,
    converter,
    loader,
    config,
    eval_step=None,
    max_batches: Optional[int] = None,
    beam_size: int = 1,
    export_csv: Optional[str] = None,
    mesh=None,
    decode_fn=None,
) -> dict[str, Any]:
    """Run the full validation pass; returns the metric dict.

    With ``mesh``, decode batches shard over the data axis (batches are
    white-padded up to a multiple of the axis size and truncated after).
    Pass ``decode_fn`` (built once via ``make_decode_fn``) when calling
    repeatedly — e.g. every valInterval — so each call reuses the same
    jitted programs instead of re-tracing one per bucket shape.
    """
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if decode_fn is None:
        decode_fn = make_decode_fn(model, config, beam_size=beam_size, mesh=mesh)
    n_data = mesh.shape["data"] if mesh is not None else 1
    token_level = config.get("token_level", "word")

    import time as _time

    loss_avg = Averager()
    n = 0
    correct = 0
    ned_sum = 0.0
    t_infer = 0.0   # device decode (reference avg infer time, infer.py:337)
    t_post = 0.0    # host detok + metrics (reference postprocess, :341)
    preds_all: list[str] = []
    gts_all: list[str] = []
    names_all: list[str] = []
    worst: list[tuple[float, str, str, str]] = []

    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        images = jnp.asarray(batch.images)
        text = jnp.asarray(batch.text)
        if eval_step is not None:
            em = eval_step(state, images, text)
            loss_avg.add(float(em["loss"]), len(batch.labels))
            per_sample = np.asarray(em["per_sample_loss"])
        else:
            per_sample = np.zeros(len(batch.labels))

        nb = len(batch.labels)
        if n_data > 1 and nb % n_data:
            pad_rows = n_data - nb % n_data
            images = jnp.pad(
                images, ((0, pad_rows), (0, 0), (0, 0), (0, 0)),
                constant_values=255,
            )
        t0 = _time.perf_counter()
        out = decode_fn(variables, images)
        tokens = np.asarray(out[0])[:nb]  # host transfer = device sync
        t_infer += _time.perf_counter() - t0

        t0 = _time.perf_counter()
        pred_tokens = converter.detokenize(tokens)
        sep = " " if token_level == "word" else ""
        preds = [sep.join(t) for t in pred_tokens]

        for p, gt, name, ls in zip(preds, batch.labels, batch.names, per_sample):
            n += 1
            if p == gt:
                correct += 1
            ned_sum += get_single_ED(gt, p)  # higher = better match score
            preds_all.append(p)
            gts_all.append(gt)
            names_all.append(name)
            worst.append((float(ls), name, gt, p))
        t_post += _time.perf_counter() - t0

    worst.sort(key=lambda t: -t[0])
    worst_lines = [
        f"loss={ls:.3f} [{nm}] gt={gt[:60]!r} pred={p[:60]!r}"
        for ls, nm, gt, p in worst[:10]
    ]

    bleu = bleu_score(
        [p.split() for p in preds_all], [[g.split()] for g in gts_all]
    ) if preds_all else 0.0
    word_ed = get_word_NED(preds_all, gts_all) if preds_all else 0.0

    if export_csv:
        # column set matches the reference prediction CSV consumed by the
        # viz selection DSL (engine/inferencing.py:34-42: name, pred,
        # label, ed, iscorrect)
        os.makedirs(os.path.dirname(export_csv) or ".", exist_ok=True)
        with open(export_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "pred", "label", "ed", "iscorrect"])
            for nm, g, p in zip(names_all, gts_all, preds_all):
                w.writerow([nm, p, g, round(get_single_ED(g, p), 4), int(p == g)])

    return {
        "samples": list(zip(names_all, gts_all, preds_all)),
        "loss": loss_avg.val(),
        "accuracy": correct / n if n else 0.0,
        "bleu": float(bleu),
        "ED": ned_sum / n if n else 0.0,  # char match score (higher=better)
        "word_ED": float(word_ed),
        "n_samples": n,
        "avg_infer_s": t_infer / max(n, 1),
        "avg_postprocess_s": t_post / max(n, 1),
        "worst": worst_lines,
    }
