"""Batched greedy decoding as a single compiled on-device loop.

Replaces the reference's per-token Python loops with host syncs
(``seq2seq.py:290-327``, ``tfm.py:119-143``).  Works with any decoder head
exposing ``init_state(enc) -> state`` and ``step(state, tokens) ->
(state, logits)`` (see ``models/decoder_lstm.py`` / ``models/decoder_tfm.py``).

Uses ``lax.while_loop`` so decoding stops as soon as every sequence in the
batch has emitted [s] — the on-device analog of the reference's
``end_flag.all()`` early exit (``seq2seq.py:324-327``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def greedy_decode(
    step_fn: Callable,
    init_state,
    batch_size: int,
    max_steps: int,
    start_token: int = 1,
    end_token: int = 2,
    pad_token: int = 0,
    chunk_schedule=None,
):
    """Greedy decode.

    Returns (tokens (B, max_steps) int32, lengths (B,) int32).  Tokens after
    the emitted [s] are pad.  The [s] itself is kept in the buffer (matching
    reference detokenize, which cuts at the first [s]).

    ``chunk_schedule``: optional list of ``(t_end, grow_fn)`` pairs for
    chunked KV-cache decode — see ``beam.beam_decode``.
    """

    tokens_buf = jnp.full((batch_size, max_steps), pad_token, jnp.int32)

    def body(carry):
        state, tokens, cur, done, t = carry
        state, logits = step_fn(state, cur)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # freeze finished rows at pad
        nxt = jnp.where(done, pad_token, nxt)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, t)
        )
        done = done | (nxt == end_token)
        return (state, tokens, nxt, done, t + 1)

    start = jnp.full((batch_size,), start_token, jnp.int32)
    done0 = jnp.zeros((batch_size,), bool)
    carry = (init_state, tokens_buf, start, done0, jnp.int32(0))
    if chunk_schedule is None:
        chunk_schedule = [(max_steps, None)]
    for t_end, grow_fn in chunk_schedule:
        def chunk_cond(carry, _t_end=t_end):
            state, tokens, cur, done, t = carry
            return (t < _t_end) & ~done.all()

        carry = jax.lax.while_loop(chunk_cond, body, carry)
        if grow_fn is not None:
            carry = (grow_fn(carry[0]),) + carry[1:]
    _, tokens, _, _, _ = carry
    lengths = jnp.sum(tokens != pad_token, axis=-1).astype(jnp.int32)
    return tokens, lengths
