"""High-level jitted inference pipelines: images -> token ids.

This is the TPU-native replacement for the reference's per-image eval loop
(``api/infer.py:73-267``): normalize + encode + autoregressive decode run
as ONE compiled XLA program per (bucket shape, batch size, beam) triple,
batched over images — where the reference is restricted to batch-1 beams
with per-step host syncs (``tfm.py:169-171``, ``seq2seq.py:89``).

Special-token ids differ per converter family (reference
``attn_converter.py:8-17`` vs ``tfm_converter.py:8-18``):
  Attn: GO=0 (doubles as pad), s=1, UNK=2
  TFM : PAD=0, GO=1, s=2
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..transforms.augment import normalize
from .beam import beam_decode, lstm_gather, tfm_gather
from .greedy import greedy_decode


class TokenIds(NamedTuple):
    start: int
    end: int
    pad: int


def token_ids_for(pred_name: str) -> TokenIds:
    if pred_name.startswith("Attn"):
        return TokenIds(start=0, end=1, pad=0)
    return TokenIds(start=1, end=2, pad=0)  # TFM family


def _chunk_ends(max_steps: int, n_chunks: int) -> list[int]:
    """Increasing chunk end-steps, last == max_steps.  Degenerates to one
    chunk when max_steps is too short to be worth the extra compiles."""
    if n_chunks <= 1 or max_steps < 8 * n_chunks:
        return [max_steps]
    size = -(-max_steps // n_chunks)
    return list(range(size, max_steps, size)) + [max_steps]


def make_decode_fn(
    model,
    config,
    beam_size: int = 1,
    max_steps: int | None = None,
    jit: bool = True,
    mesh=None,
    decode_chunks: int = 5,
) -> Callable:
    """Build ``fn(variables, images_u8) -> (tokens (B, T), aux (B,))``.

    ``images_u8``: (B, H, W, 1) uint8 bucket-padded pixels; normalization
    (reference ``Math_Transform`` eval path, ``engine/inferencing.py:53-56``)
    is fused into the same program.  ``aux`` is lengths for greedy, scores
    for beam.

    With ``mesh`` (a ``jax.sharding.Mesh``), inputs are placed with
    batch-axis sharding over the ``data`` axis before the jitted call —
    multi-chip batched inference with XLA-inserted collectives.  The batch
    must be divisible by the data-axis size (pad with white images).

    ``decode_chunks`` (TFM head only): the decode loop runs as this many
    sequential while_loops with the KV cache grown between them, so early
    steps only stream the live cache prefix instead of all max_steps*K
    slots (~0.6x of the full-length per-step HBM read on average at 5
    chunks; token-exact — `tests/test_model_variants.py`).  Costs one
    compiled loop body per chunk; set 1 to disable.
    """
    pred_name = config["Prediction"]["name"]
    ids = token_ids_for(pred_name)
    mean, std = config.get("mean", 0.5), config.get("std", 0.5)
    if max_steps is None:
        max_steps = config["batch_max_length"] + 1
    is_tfm_head = pred_name in ("TFM", "MS_TFM")
    gather = tfm_gather if is_tfm_head else lstm_gather

    # chunked KV-cache schedule (TFM only: the LSTM state has no
    # step-count-sized leaves, its per-step reads are already O(1))
    ends = _chunk_ends(max_steps, decode_chunks) if is_tfm_head else [max_steps]

    def make_schedule(k: int):
        from ..models.decoder_tfm import grow_decode_state

        schedule = []
        for i, t_end in enumerate(ends):
            grow = None
            if i + 1 < len(ends):
                nxt = ends[i + 1]
                grow = lambda s, _n=nxt: grow_decode_state(s, _n, k)
            schedule.append((t_end, grow))
        return schedule

    def run(variables, images):
        x = images.astype(jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        x = normalize(x, mean=mean, std=std)
        B = x.shape[0]

        enc = model.apply(variables, x, method="encode")

        def step(state, tokens):
            return model.apply(variables, state, tokens, method="decode_step")

        if beam_size <= 1:
            state = model.apply(
                variables, enc, max_steps, method="init_decode_state",
                live_steps=ends[0],
            )
            return greedy_decode(
                step, state, B, max_steps,
                start_token=ids.start, end_token=ids.end, pad_token=ids.pad,
                chunk_schedule=make_schedule(1),
            )

        # enc stays UNexpanded: init_decode_state allocates per-beam leaves
        # at B*K rows while the attention memory is shared at B rows, so
        # each decode step reads it once per sample instead of once per beam
        state = model.apply(
            variables, enc, max_steps, beam_size, method="init_decode_state",
            live_steps=ends[0],
        )
        return beam_decode(
            step, state, gather, B, beam_size, max_steps,
            start_token=ids.start, end_token=ids.end, pad_token=ids.pad,
            chunk_schedule=make_schedule(beam_size),
        )

    if not jit:
        return run
    jitted = jax.jit(run)
    if mesh is None:
        return jitted

    from ..parallel import shard_batch

    def sharded(variables, images):
        return jitted(variables, shard_batch(images, mesh))

    return sharded
