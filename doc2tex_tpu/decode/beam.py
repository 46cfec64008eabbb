"""Batched beam search, fully on device.

Replaces the reference's batch-1, CPU-synced beams:
- LSTM head beam (``seq2seq_v2.py:12-174``): live-beam list shrinks as
  hypotheses finish, state is re-indexed with host lists every step.
- TFM head beam (``tfm.py:145-186`` + ``tools/beam.py:7-140``): scores are
  moved to CPU every step (``log_prob.cpu()``) for topk bookkeeping.

Here beams are an extra array axis: state leaves carry a flattened (B*K)
leading dim, candidate expansion is a single ``lax.top_k`` over K*V scores,
and finished hypotheses are frozen in place (they emit exactly one
pad-continuation candidate with unchanged score), which is algebraically the
same as the reference's shrink-the-beam bookkeeping.  Final selection is the
length-normalized argmax over finished hypotheses (reference
``seq2seq.py:210-213``), falling back to beam 0 when nothing finished
(reference ``seq2seq.py:200-208``).

Works for any head exposing ``step(state, tokens) -> (state, logits)`` plus
a ``gather_fn(state, flat_idx)`` that re-indexes the per-beam state leaves
(KV caches, LSTM carries) while leaving beam-invariant leaves (encoder
memory) untouched.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _gather_beams(x, beam_idx, batch_size, k):
    """x: (B*K, ...) -> x[beam_idx] per batch group. beam_idx: (B, K)."""
    shaped = x.reshape(batch_size, k, *x.shape[1:])
    idx = beam_idx.reshape(batch_size, k, *([1] * (x.ndim - 1)))
    out = jnp.take_along_axis(shaped, idx, axis=1)
    return out.reshape(batch_size * k, *x.shape[1:])


def make_gather_fn(static_fields: tuple[str, ...] = ()) -> Callable:
    """Build a gather_fn for a NamedTuple state; ``static_fields`` are
    beam-invariant (encoder memory, step counters) and skipped."""

    def gather(state, beam_idx, batch_size, k):
        updates = {}
        for name, leaf in state._asdict().items():
            if name in static_fields:
                continue
            updates[name] = _gather_beams(leaf, beam_idx, batch_size, k)
        return state._replace(**updates)

    return gather


# Beam-invariant fields for the two built-in heads.
LSTM_STATIC = ("enc", "enc_proj")
TFM_STATIC = ("k_mem", "v_mem", "t")


def tfm_gather(state, beam_idx, batch_size, k):
    """TFMState caches have layout (L, B*K, T, ...): gather on axis 1."""
    def g(x):
        shaped = x.reshape(x.shape[0], batch_size, k, *x.shape[2:])
        idx = beam_idx.reshape(1, batch_size, k, *([1] * (x.ndim - 2)))
        out = jnp.take_along_axis(shaped, idx, axis=2)
        return out.reshape(x.shape)

    return state._replace(k_cache=g(state.k_cache), v_cache=g(state.v_cache))


def lstm_gather(state, beam_idx, batch_size, k):
    return make_gather_fn(LSTM_STATIC)(state, beam_idx, batch_size, k)


def expand_for_beams(tree, k, static_fields: tuple[str, ...] = (), axis: int = 0):
    """Repeat each batch row K times along the leading batch axis."""
    def rep(x):
        return jnp.repeat(x, k, axis=axis)

    if hasattr(tree, "_asdict"):
        updates = {
            name: (leaf if name in static_fields else rep(leaf))
            for name, leaf in tree._asdict().items()
        }
        return tree._replace(**updates)
    return jax.tree_util.tree_map(rep, tree)


def beam_decode(
    step_fn: Callable,
    init_state,
    gather_fn: Callable,
    batch_size: int,
    beam_size: int,
    max_steps: int,
    start_token: int = 1,
    end_token: int = 2,
    pad_token: int = 0,
    length_offset: int = 1,
):
    """Beam search over a (B*K)-flattened state.

    ``init_state`` must already be expanded to B*K rows (use
    ``expand_for_beams`` on the encoder output before ``init_state``, or on
    the state itself).  Returns (tokens (B, max_steps), scores (B,)) for the
    length-normalized best finished hypothesis per batch row.

    ``length_offset`` reproduces the reference normalization denominator:
    it divides by len(seq incl. [GO] and [s]) (seq2seq.py:210-213), i.e.
    emitted-token count + 1.
    """
    B, K, V_steps = batch_size, beam_size, max_steps

    tokens_buf = jnp.full((B, K, V_steps), pad_token, jnp.int32)
    # beam 0 active, others -inf so step 0 expands only beam 0
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG_INF)])[None], (B, 1)
    )
    finished0 = jnp.zeros((B, K), bool)
    cur0 = jnp.full((B * K,), start_token, jnp.int32)
    lengths0 = jnp.zeros((B, K), jnp.int32)

    def cond(carry):
        state, tokens, scores, cur, finished, lengths, t = carry
        return (t < max_steps) & ~finished.all()

    def body(carry):
        state, tokens, scores, cur, finished, lengths, t = carry
        state, logits = step_fn(state, cur)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, K, -1)
        V = logp.shape[-1]

        # live beams expand over V; finished beams emit a single frozen
        # pad-continuation (all other candidates -inf)
        live_cand = scores[..., None] + logp
        frozen_cand = (
            jnp.full((B, K, V), NEG_INF).at[:, :, pad_token].set(0.0)
            + scores[..., None]
        )
        cand = jnp.where(finished[..., None], frozen_cand, live_cand)

        flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)  # (B, K)
        beam_idx = top_idx // V
        tok = (top_idx % V).astype(jnp.int32)

        # re-index state + bookkeeping by parent beam
        state = gather_fn(state, beam_idx, B, K)
        tokens = jnp.take_along_axis(tokens, beam_idx[..., None], axis=1)
        finished = jnp.take_along_axis(finished, beam_idx, axis=1)
        lengths = jnp.take_along_axis(lengths, beam_idx, axis=1)

        # record token (pad for already-finished beams)
        write = jnp.where(finished, pad_token, tok)
        tokens = jax.lax.dynamic_update_slice(
            tokens, write[..., None], (0, 0, t)
        )
        newly_done = ~finished & (tok == end_token)
        lengths = jnp.where(finished, lengths, lengths + 1)
        finished = finished | newly_done

        cur = jnp.where(finished, pad_token, tok).reshape(B * K)
        return (state, tokens, top_scores, cur, finished, lengths, t + 1)

    carry = (init_state, tokens_buf, scores0, cur0, finished0, lengths0, jnp.int32(0))
    _, tokens, scores, _, finished, lengths, _ = jax.lax.while_loop(cond, body, carry)

    # length-normalized selection among finished; fall back to beam 0
    norm = scores / (lengths + length_offset).astype(jnp.float32)
    norm = jnp.where(finished, norm, NEG_INF)
    any_finished = finished.any(axis=1)
    best = jnp.argmax(norm, axis=1)
    best = jnp.where(any_finished, best, 0)
    best_tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return best_tokens, best_scores
