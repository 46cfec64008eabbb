"""Checkpoint save/load with best-metric tracking and pos-embed resize.

Parity targets:
- ``save_checkpoint`` payload {model, optimizer, best_acc, best_ED,
  best_word_ED, best_bleu, iter} (reference ``doc2tex/utils/
  model_utils.py:120-133``)
- three maintained files: ``best_bleu``, ``best_accuracy``, ``last_checkpoint``
  (reference ``doc2tex/engine/training.py:253-289``)
- ``load_checkpoint`` with (a) partial pretrained init, (b) full resume, and
  learned pos-embed grid re-interpolation when image max-dims changed
  (reference ``model_utils.py:136-226`` + ``resize_pos_embed``
  ``postional_encoding.py:222-250``)

Format: msgpack via flax.serialization (pure pytree of numpy arrays) plus a
JSON sidecar of scalars — no torch pickle.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax import traverse_util


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    state,
    extra: Optional[Mapping[str, Any]] = None,
) -> None:
    """Serialize a TrainState(+extras) to ``path`` (.msgpack) + sidecar."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "step": np.asarray(state.step),
        "params": _to_numpy(state.params),
        "batch_stats": _to_numpy(state.batch_stats),
        "opt_state": _to_numpy(state.opt_state),
    }
    # to_state_dict converts NamedTuple optax states into plain dicts
    payload = serialization.to_state_dict(payload)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    meta = dict(extra or {})
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2, default=float)


def load_checkpoint(
    path: str,
    state_template=None,
) -> tuple[Any, dict]:
    """Load a checkpoint.

    With ``state_template`` (a TrainState) the restored arrays replace the
    template leaves (full resume incl. optimizer).  Without it, returns the
    raw dict (params-only partial init).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    if state_template is None:
        return payload, meta

    restored = state_template._replace(
        step=jnp.asarray(payload["step"]),
        params=serialization.from_state_dict(state_template.params, payload["params"]),
        batch_stats=serialization.from_state_dict(
            state_template.batch_stats, payload["batch_stats"]
        ),
        opt_state=serialization.from_state_dict(
            state_template.opt_state, payload["opt_state"]
        ),
    )
    return restored, meta


def _partial_restore(saved_tree, target) -> tuple[Any, dict]:
    """Copy every saved leaf whose path + shape match into ``target``
    (reference ``model_utils.py:139-147`` strict=False semantics), resizing
    learned pos-embeds when only the grid length differs."""
    saved = traverse_util.flatten_dict(saved_tree, sep="/")
    flat = traverse_util.flatten_dict(
        serialization.to_state_dict(target), sep="/"
    )
    loaded = skipped = resized = 0
    for k, v in flat.items():
        if k not in saved:
            skipped += 1
            continue
        sv = np.asarray(saved[k])
        if sv.shape == v.shape:
            flat[k] = sv.astype(np.asarray(v).dtype)
            loaded += 1
        elif (
            "pos_embed" in k
            and sv.ndim == v.ndim == 2
            and sv.shape[-1] == v.shape[-1]
        ):
            flat[k] = resize_pos_embed(sv, v.shape[0]).astype(
                np.asarray(v).dtype
            )
            resized += 1
        else:
            skipped += 1
    restored = traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in flat.items()}
    )
    out = serialization.from_state_dict(target, restored)
    return out, {"loaded": loaded, "skipped": skipped, "resized": resized}


def load_pretrained_params(path: str, params) -> Any:
    """Partial (strict=False) params-only init from a checkpoint."""
    payload, _ = load_checkpoint(path)
    return _partial_restore(payload["params"], params)


def load_pretrained_variables(
    path: str, params, batch_stats=None
) -> tuple[Any, Any, dict]:
    """Partial init of params AND batch-norm running stats.

    The reference's ``load_state_dict`` restores BN running stats together
    with the weights; params-only restore would evaluate a trained BN model
    against freshly-initialized statistics."""
    payload, _ = load_checkpoint(path)
    params_out, info = _partial_restore(payload["params"], params)
    stats_out = batch_stats
    if batch_stats is not None and payload.get("batch_stats"):
        stats_out, sinfo = _partial_restore(
            payload["batch_stats"], batch_stats
        )
        info = dict(info, stats_loaded=sinfo["loaded"],
                    stats_skipped=sinfo["skipped"])
    return params_out, stats_out, info


def resize_pos_embed(table: np.ndarray, new_len: int) -> np.ndarray:
    """Resize a flat (N+1, D) learned pos-embed (cls row 0) to new_len rows
    by linear interpolation over the sequence axis (reference
    ``resize_pos_embed`` re-interpolates the 2D grid; flat-sequence
    interpolation is the shape-agnostic equivalent used when the stored
    grid shape is unknown)."""
    cls, grid = table[:1], table[1:]
    n_new = new_len - 1
    x = jnp.asarray(grid, jnp.float32)[None, :, :]  # (1, N, D)
    y = jax.image.resize(x, (1, n_new, x.shape[-1]), "linear")[0]
    return np.concatenate([cls, np.asarray(y)], axis=0)


class BestCheckpointKeeper:
    """Maintains best_bleu / best_accuracy / last files
    (reference engine/training.py:253-289)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.best = {"bleu": -1.0, "accuracy": -1.0, "ED": -1.0, "word_ED": -1.0}
        os.makedirs(log_dir, exist_ok=True)

    def seed_best(self, meta: Mapping[str, Any]) -> None:
        """Restore the best-metric gates from a resume checkpoint's sidecar
        so the first post-resume validation can't overwrite a better
        best_bleu/best_accuracy file (reference model_utils.py:222-237)."""
        for meta_key, key in (
            ("best_bleu", "bleu"),
            ("best_acc", "accuracy"),
            ("best_ED", "ED"),
            ("best_word_ED", "word_ED"),
        ):
            if meta_key in meta:
                self.best[key] = max(self.best[key], float(meta[meta_key]))

    def _extra(self, iteration: int) -> dict:
        return {
            "iter": iteration,
            "best_bleu": self.best["bleu"],
            "best_acc": self.best["accuracy"],
            "best_ED": self.best["ED"],
            "best_word_ED": self.best["word_ED"],
        }

    def update(self, state, iteration: int, metrics: Mapping[str, float]) -> list[str]:
        """Save best-gated + last checkpoints; returns saved file names."""
        saved = []
        gates = (("bleu", "best_bleu.msgpack"), ("accuracy", "best_accuracy.msgpack"))
        for key, fname in gates:
            v = float(metrics.get(key, -1.0))
            if v > self.best[key]:
                self.best[key] = v
                for mkey in ("ED", "word_ED"):
                    if mkey in metrics:
                        self.best[mkey] = max(self.best[mkey], float(metrics[mkey]))
                save_checkpoint(
                    os.path.join(self.log_dir, fname), state, self._extra(iteration)
                )
                saved.append(fname)
        save_checkpoint(
            os.path.join(self.log_dir, "last_checkpoint.msgpack"),
            state,
            self._extra(iteration),
        )
        saved.append("last_checkpoint.msgpack")
        return saved
