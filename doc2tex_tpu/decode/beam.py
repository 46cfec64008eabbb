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
    """x: (B*K, ...) -> x[beam_idx] per batch group. beam_idx: (B, K).

    Plain take_along_axis: every leaf routed here is small (LSTM carries,
    alignment vectors — the TFM KV caches are fixed-slot and never
    gathered, see ``tfm_gather``).  A one-hot einsum variant was tried
    for cache-sized leaves but silently truncates f32 state to bf16 on
    TPU default matmul precision — exactness matters more here."""
    shaped = x.reshape(batch_size, k, -1)
    out = jnp.take_along_axis(shaped, beam_idx[..., None], axis=1)
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


# Beam-invariant fields for the LSTM head (the int8 memory scales are
# per-sample, identical across beams — and the bf16 path carries
# (0,)-shaped placeholders that must not be reshaped).  The TFM head has
# no static list: its gather fn (``tfm_gather``) touches only ``sel`` —
# KV caches are fixed-slot, cross K/V shared at the batch dim.
LSTM_STATIC = ("enc", "enc_proj", "enc_scale", "proj_scale")


def tfm_gather(state, beam_idx, batch_size, k):
    """Reorder ONLY the (B, K, T, K) ancestry selection — the KV caches
    live in fixed physical slots and are never moved (physically permuting
    ~600 MB of cache per step measured ~8-18 ms/step, 10x the step itself;
    permuting ``sel`` is ~2 MB).  See TFMState docstring."""
    onehot = jax.nn.one_hot(beam_idx, k, dtype=state.sel.dtype)  # (B,Kn,Ko)
    sel = jnp.einsum("bnk,bktj->bntj", onehot, state.sel)
    return state._replace(sel=sel)


def lstm_gather(state, beam_idx, batch_size, k):
    return make_gather_fn(LSTM_STATIC)(state, beam_idx, batch_size, k)


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
    chunk_schedule=None,
):
    """Beam search over a (B*K)-flattened state.

    ``init_state``'s per-beam leaves must already be expanded to B*K rows
    (``init_decode_state(enc, max_steps, beam_size)`` does this; beam-
    invariant leaves like the encoder memory stay at B rows and are read
    beam-folded by the step fn).  Returns (tokens (B, max_steps),
    scores (B,)) for the length-normalized best finished hypothesis per
    batch row.

    ``length_offset`` reproduces the reference normalization denominator:
    it divides by len(seq incl. [GO] and [s]) (seq2seq.py:210-213), i.e.
    emitted-token count + 1.

    ``chunk_schedule``: optional list of ``(t_end, grow_fn)`` pairs, last
    ``t_end == max_steps``.  The decode runs as sequential while_loops,
    one per chunk; after each non-final chunk ``grow_fn(state)`` enlarges
    the state's KV caches (``decoder_tfm.grow_decode_state``) so steps in
    early chunks only stream the live cache prefix.  The early-exit cond
    still applies inside every chunk.
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
    # finished-hypothesis store: the reference keeps EVERY completed
    # hypothesis aside (complete_seqs, seq2seq.py:170-178); we keep the
    # running length-normalized best so a finished beam can never be lost
    # to slot eviction by a higher-scoring live continuation.
    best_norm0 = jnp.full((B,), NEG_INF)
    best_tokens0 = jnp.full((B, V_steps), pad_token, jnp.int32)
    best_scores0 = jnp.full((B,), NEG_INF)

    def body(carry):
        (state, tokens, scores, cur, finished, lengths, t,
         best_norm, best_tokens, best_scores) = carry
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

        # fold newly finished hypotheses into the store
        cand_norm = jnp.where(
            newly_done,
            top_scores / (lengths + length_offset).astype(jnp.float32),
            NEG_INF,
        )
        slot = jnp.argmax(cand_norm, axis=1)                    # (B,)
        slot_norm = jnp.take_along_axis(cand_norm, slot[:, None], 1)[:, 0]
        improved = slot_norm > best_norm
        new_best_tokens = jnp.take_along_axis(
            tokens, slot[:, None, None], axis=1
        )[:, 0]
        best_tokens = jnp.where(improved[:, None], new_best_tokens, best_tokens)
        best_scores = jnp.where(
            improved,
            jnp.take_along_axis(top_scores, slot[:, None], 1)[:, 0],
            best_scores,
        )
        best_norm = jnp.maximum(best_norm, slot_norm)

        cur = jnp.where(finished, pad_token, tok).reshape(B * K)
        return (state, tokens, top_scores, cur, finished, lengths, t + 1,
                best_norm, best_tokens, best_scores)

    carry = (init_state, tokens_buf, scores0, cur0, finished0, lengths0,
             jnp.int32(0), best_norm0, best_tokens0, best_scores0)
    if chunk_schedule is None:
        chunk_schedule = [(max_steps, None)]
    for t_end, grow_fn in chunk_schedule:
        def chunk_cond(carry, _t_end=t_end):
            (state, tokens, scores, cur, finished, lengths, t, *_rest) = carry
            return (t < _t_end) & ~finished.all()

        carry = jax.lax.while_loop(chunk_cond, body, carry)
        if grow_fn is not None:
            carry = (grow_fn(carry[0]),) + carry[1:]
    (_, tokens, scores, _, finished, lengths, _,
     best_norm, store_tokens, store_scores) = carry

    # length-normalized selection among finished slots, merged with the
    # store; fall back to beam 0 when nothing ever finished
    # (reference seq2seq.py:200-220)
    norm = scores / (lengths + length_offset).astype(jnp.float32)
    norm = jnp.where(finished, norm, NEG_INF)
    best = jnp.argmax(norm, axis=1)
    slot_norm = jnp.take_along_axis(norm, best[:, None], 1)[:, 0]
    slot_tokens = jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]
    slot_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]

    use_store = best_norm > slot_norm
    out_tokens = jnp.where(use_store[:, None], store_tokens, slot_tokens)
    out_scores = jnp.where(use_store, store_scores, slot_scores)

    nothing_finished = ~(finished.any(axis=1) | (best_norm > NEG_INF / 2))
    fallback_tokens = tokens[:, 0]
    fallback_scores = scores[:, 0]
    out_tokens = jnp.where(nothing_finished[:, None], fallback_tokens, out_tokens)
    out_scores = jnp.where(nothing_finished, fallback_scores, out_scores)
    return out_tokens, out_scores
