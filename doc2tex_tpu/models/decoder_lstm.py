"""LSTM attention decoders (coverage / location-aware / Bahdanau).

Parity targets in the reference:
- ``Attention`` / ``AttentionV2``: ``doc2tex/modules/component/
  prediction_head/seq2seq.py:10-346`` and ``seq2seq_v2.py:11-293``
- attention cells: ``.../addon_module/attention1D.py:74-242``

TPU-native design (the key inversion vs the reference):
- The reference loops per token in Python, re-projecting the encoder keys
  every step (``attention1D.py:143``).  Here the key projection
  ``key_proj(enc)`` is computed ONCE and the token loop is a ``lax.scan``
  carrying (h, c, alpha_cum) — one compiled program, no host syncs.
- Greedy/beam decode is exposed through an ``init_state`` / ``step``
  interface consumed by ``doc2tex_tpu.decode`` (batched, on device).
- Embedding padding_idx=[GO] semantics (reference seq2seq.py:33-35) are
  reproduced by masking the embedding output for token 0, which also stops
  gradients to that row.

The LSTM cell matches torch.nn.LSTMCell math (gate order i, f, g, o).
State is carried in f32; matmuls run in the compute dtype for the MXU.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import trunc_init

Dtype = Any


class DecoderState(NamedTuple):
    """Per-sequence decode state carried across steps (all leading dim B).

    When traced under ``quantized_inference(parts=(..., 'decoder_mem'))``
    the attention memory (enc / enc_proj) is stored int8 with per-sample
    scales — halving the HBM reads that dominate each decode step; the
    consumers in ``step`` dequantize inline (detected by dtype, so the
    step trace is self-describing).  Outside the context the scales are
    size-1 placeholders and the bf16 path is bit-identical to before."""

    h: jax.Array          # (B, H) f32
    c: jax.Array          # (B, H) f32
    alpha_cum: jax.Array  # (B, S) f32 — coverage accumulator (zeros if unused)
    alpha_prev: jax.Array  # (B, S) f32 — last alignment (loc_aware memory)
    enc: jax.Array        # (B, S, D) — encoder states (attention values)
    enc_proj: jax.Array   # (B, S, H) — precomputed key projection
    enc_scale: jax.Array   # (B, 1, 1) f32 — int8 scale (or (0,) placeholder)
    proj_scale: jax.Array  # (B, 1, 1) f32 — int8 scale (or (0,) placeholder)


def _lstm_cell(params, x, h, c):
    """torch.nn.LSTMCell-equivalent (gate order i, f, g, o)."""
    gates = (
        x @ params["w_ih"] + params["b_ih"] + h @ params["w_hh"] + params["b_hh"]
    ).astype(jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class LSTMAttentionDecoder(nn.Module):
    """Coverage-attention LSTM decoder head (Attn / Attnv2 heads)."""

    num_classes: int
    input_size: int = 256       # encoder feature dim D
    hidden_size: int = 256      # LSTM hidden H
    embed_dim: int | None = None
    kernel_size: int = 2        # loc conv half-width -> kernel 2k+1
    kernel_dim: int = 128
    attn_type: str = "coverage"  # 'coverage'|'loc_aware'|'bahdanau'|'luong'
    method: str = "dot"          # luong scoring: 'dot'|'general'|'concat'
    embed_target: bool = True
    enc_init: bool = True
    seqmodel: str = "TFM"       # 'TFM' splits cls token (AttentionV2)
    v2: bool = True             # AttentionV2 cls-split semantics
    droprate: float = 0.1
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        H, D, V = self.hidden_size, self.input_size, self.num_classes
        E = self.embed_dim or self.input_size
        f32 = jnp.float32
        if self.embed_target:
            self.embedding = self.param("embedding", trunc_init, (V, E), f32)
            in_dim = E if self.attn_type == "luong" else D + E
        else:
            in_dim = V if self.attn_type == "luong" else D + V
        if self.enc_init:
            self.w_init_h = self.param("w_init_h", trunc_init, (D, H), f32)
            self.b_init_h = self.param("b_init_h", nn.initializers.zeros, (H,), f32)
            self.w_init_c = self.param("w_init_c", trunc_init, (D, H), f32)
            self.b_init_c = self.param("b_init_c", nn.initializers.zeros, (H,), f32)
        # attention cell params
        if self.attn_type == "luong":
            # Luong scoring (reference attention1D.py:8-71): LSTM input is
            # the embedding alone; generator consumes [context; h].
            if self.method in ("general", "concat"):
                self.w_luong = self.param("w_luong", trunc_init, (H, H), f32)
            if self.method == "concat":
                self.v_luong = self.param("v_luong", trunc_init, (H, 1), f32)
        else:
            self.w_key = self.param("w_key", trunc_init, (D, H), f32)
            self.b_key = self.param("b_key", nn.initializers.zeros, (H,), f32)
            self.w_query = self.param("w_query", trunc_init, (H, H), f32)
            self.b_query = self.param("b_query", nn.initializers.zeros, (H,), f32)
            self.w_score = self.param("w_score", trunc_init, (H, 1), f32)
            self.b_score = self.param("b_score", nn.initializers.zeros, (1,), f32)
        if self.attn_type in ("coverage", "loc_aware"):
            k = 2 * self.kernel_size + 1
            self.loc_conv_w = self.param(
                "loc_conv_w", trunc_init, (k, 1, self.kernel_dim), f32
            )
            self.loc_conv_b = self.param(
                "loc_conv_b", nn.initializers.zeros, (self.kernel_dim,), f32
            )
            self.w_loc = self.param("w_loc", trunc_init, (self.kernel_dim, H), f32)
            self.b_loc = self.param("b_loc", nn.initializers.zeros, (H,), f32)
        # LSTM cell
        self.lstm = {
            "w_ih": self.param("w_ih", trunc_init, (in_dim, 4 * H), f32),
            "b_ih": self.param("b_ih", nn.initializers.zeros, (4 * H,), f32),
            "w_hh": self.param("w_hh", trunc_init, (H, 4 * H), f32),
            "b_hh": self.param("b_hh", nn.initializers.zeros, (4 * H,), f32),
        }
        gen_in = D + H if self.attn_type == "luong" else H
        self.w_gen = self.param("w_gen", trunc_init, (gen_in, V), f32)
        self.b_gen = self.param("b_gen", nn.initializers.zeros, (V,), f32)

    # ------------------------------------------------------------------
    def _split_enc(self, batch_H):
        """AttentionV2 cls-token split (seq2seq_v2.py:24-44)."""
        if self.v2 and self.seqmodel == "TFM":
            return batch_H[:, 1:, :], batch_H[:, 0, :]
        if self.seqmodel in ("BiLSTM", "VIG"):
            return batch_H, batch_H.mean(axis=1)
        # V1 semantics: attend over everything incl. cls; init from cls
        return batch_H, batch_H[:, 0, :]

    def _embed(self, tokens):
        """Embedding lookup with padding_idx=[GO]=0 semantics."""
        if self.embed_target:
            emb = self.embedding[tokens]
            return emb * (tokens != 0)[..., None]
        return jax.nn.one_hot(tokens, self.num_classes, dtype=jnp.float32)

    def init_state(self, batch_H, beam_size: int = 1) -> DecoderState:
        # Beam layout: EVERY leaf is expanded to B*K rows, encoder memory
        # included.  A shared-memory variant (enc at B rows, beam folded
        # into the score/context einsums like the TFM head) was measured
        # SLOWER on v5e-1 (2343 -> 1468 img/s headline): XLA's lowering of
        # the folded einsums materializes broadcast products, while the
        # expanded per-row reads stream at ~420 GB/s.
        if beam_size > 1:
            batch_H = jnp.repeat(batch_H, beam_size, axis=0)
        # attention memory kept in the compute dtype: enc/enc_proj reads
        # dominate decode-step HBM traffic (bf16 halves it); scores/softmax
        # and the LSTM carry stay f32 below
        enc, init_emb = self._split_enc(batch_H.astype(self.dtype))
        init_emb = init_emb.astype(jnp.float32)
        B, S, _ = enc.shape
        H = self.hidden_size
        if self.enc_init:
            h = init_emb @ self.w_init_h + self.b_init_h
            c = init_emb @ self.w_init_c + self.b_init_c
        else:
            h = jnp.zeros((B, H), jnp.float32)
            c = jnp.zeros((B, H), jnp.float32)
        if self.attn_type == "luong":
            # zero-size placeholder: luong never reads enc_proj, so don't
            # allocate (B,S,H) of HBM that every decode step would carry
            enc_proj = jnp.zeros((B, 0, 0), self.dtype)
        else:
            enc_proj = (
                enc @ self.w_key.astype(self.dtype) + self.b_key
            ).astype(self.dtype)
        zeros = jnp.zeros((B, S), jnp.float32)
        from ..ops.quant import quant_part_active, quantize_memory

        if quant_part_active("decoder_mem") and self.attn_type != "luong":
            enc, enc_scale = quantize_memory(enc)
            enc_proj, proj_scale = quantize_memory(enc_proj)
        else:
            enc_scale = jnp.zeros((0,), jnp.float32)   # placeholder
            proj_scale = jnp.zeros((0,), jnp.float32)
        return DecoderState(h, c, zeros, zeros, enc, enc_proj,
                            enc_scale, proj_scale)

    def step(
        self, state: DecoderState, tokens, deterministic: bool = True
    ) -> tuple[DecoderState, jax.Array]:
        """One decode step: tokens (B,) int32 -> (new_state, logits (B, V))."""
        emb = self._embed(tokens)
        H = self.hidden_size

        if self.attn_type == "luong":
            # LSTM first, then score against its new hidden (reference
            # LuongAttention.forward, attention1D.py:19-35)
            h_new, c_new = _lstm_cell(self.lstm, emb, state.h, state.c)
            if self.method == "dot":
                e = jnp.einsum("bsd,bd->bs", state.enc, h_new)
            elif self.method == "general":
                e = jnp.einsum("bsd,bd->bs", state.enc, h_new @ self.w_luong)
            else:  # concat
                mix = jnp.tanh((h_new[:, None, :] + state.enc) @ self.w_luong)
                e = (mix @ self.v_luong)[..., 0]
            alpha = jax.nn.softmax(e, axis=-1)
            context = jnp.einsum("bs,bsd->bd", alpha, state.enc)
            out = jnp.tanh(jnp.concatenate([context, h_new], axis=-1))
            logits = out @ self.w_gen + self.b_gen
            new_state = state._replace(h=h_new, c=c_new, alpha_prev=alpha)
            return new_state, logits

        # location context from the attention memory
        if self.attn_type in ("coverage", "loc_aware"):
            mem = state.alpha_cum if self.attn_type == "coverage" else state.alpha_prev
            loc = jax.lax.conv_general_dilated(
                mem[..., None],
                self.loc_conv_w,
                window_strides=(1,),
                padding=[(self.kernel_size, self.kernel_size)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + self.loc_conv_b
            loc = loc @ self.w_loc + self.b_loc  # (B, S, H)
        else:
            loc = 0.0

        # int8 attention memory (ops/quant.py decoder_mem): dequant inline —
        # the int8 HBM read is the win; the convert fuses into the consumers
        qmem = state.enc_proj.dtype == jnp.int8
        if qmem:
            proj = state.enc_proj.astype(self.dtype) * state.proj_scale.astype(
                self.dtype
            )
        else:
            proj = state.enc_proj
        q = (state.h @ self.w_query + self.b_query)[:, None, :]
        e = jnp.tanh(proj + q + loc) @ self.w_score + self.b_score  # (B,S,1)
        alpha = jnp.asarray(jax.nn.softmax(e[..., 0], axis=-1))  # (B, S)
        # capturable alignment for attention-overlay viz (reference packs
        # alpha into addition_outputs, build_model.py:65-77)
        self.sow("intermediates", "alpha", alpha)
        if qmem:
            context = (
                jnp.einsum("bs,bsd->bd", alpha, state.enc.astype(self.dtype))
                * state.enc_scale[..., 0]
            )
        else:
            context = jnp.einsum("bs,bsd->bd", alpha, state.enc)

        x = jnp.concatenate([context, emb], axis=-1)
        h_new, c_new = _lstm_cell(self.lstm, x, state.h, state.c)
        logits = h_new @ self.w_gen + self.b_gen
        # tensor-parallel vocab projection boundary: logits stay sharded
        # over the model axis (w_gen is column-parallel); top-k/softmax
        # gathers ride ICI only where needed
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, shard_activation

        logits = shard_activation(logits, (DATA_AXIS, MODEL_AXIS))
        # (train-time logit dropout is applied over the stacked scan output
        # in __call__; decode paths are always deterministic)

        new_state = state._replace(
            h=h_new,
            c=c_new,
            alpha_cum=state.alpha_cum + alpha,
            alpha_prev=alpha,
        )
        return new_state, logits

    # ------------------------------------------------------------------
    def __call__(self, batch_H, text, train: bool = True):
        """Teacher-forced pass.

        ``text`` is the already-shifted input ids ``encoded[:, :-1]`` of
        static width T = batch_max_length + 1; returns logits (B, T, V)
        aligned with targets ``encoded[:, 1:]`` (reference
        engine/training.py:78-85 + seq2seq.py:290-327).
        """
        state = self.init_state(batch_H)

        def body(st, tok):
            st, logits = self.step(st, tok, deterministic=True)
            return st, logits

        _, logits = jax.lax.scan(body, state, text.T)
        logits = jnp.transpose(logits, (1, 0, 2))  # (B, T, V)
        # Reference applies dropout to per-step logits (seq2seq.py:299).
        # Dropout masks are iid across steps/elements, so one dropout over
        # the stacked logits is distributionally identical and keeps the
        # scan body rng-free.
        if train and self.droprate > 0.0:
            rng = self.make_rng("dropout")
            keep = 1.0 - self.droprate
            m = jax.random.bernoulli(rng, keep, logits.shape)
            logits = jnp.where(m, logits / keep, 0.0)
        return logits
