"""Transformer decoder prediction head with on-device KV-cache decoding.

Parity target: reference ``TransformerPrediction``
(``doc2tex/modules/component/prediction_head/tfm.py:35-195``) — a post-LN
torch ``nn.TransformerDecoder`` (self-attn -> cross-attn -> relu FFN, norm
after each residual), word embedding scaled by sqrt(d) + sin-cos positional
encoding, linear vocab projection.

TPU-native inversion: the reference's eval loop re-runs the FULL decoder
over the growing target every step (``tfm.py:125-140``) and its beam search
round-trips scores to the CPU every step (``tfm.py:169-171`` ->
``tools/beam.py:68``).  Here decode is an ``init_state``/``step`` interface
with per-layer KV caches and precomputed cross-attention K/V, driven by
``doc2tex_tpu.decode`` entirely on device: O(T) attention per step instead
of O(T^2) full re-runs, zero host syncs.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.decode_attention import decode_attention
from .layers import trunc_init, word_posenc

Dtype = Any

xavier = nn.initializers.xavier_uniform()


class TFMState(NamedTuple):
    """Decode state: KV caches stacked over layers (axis 0).

    Beam design (both measured on v5e-1 at batch 256 x beam 5):

    - The cross-attention memory K/V stay at the SHARED batch dim B:
      beams of one sample attend over identical encoder states, so
      expanding them K-fold would multiply that per-step HBM read by the
      beam width.  ``step`` recovers K = (B*K) // B from the leaf shapes
      and folds the beam axis into the cross-attention query.
    - The self-attention caches live in FIXED physical slots and are
      NEVER reordered by the beam shuffle (physically permuting ~600 MB
      of cache per step was ~8-18 ms/step — 10x the step itself).
      Instead ``sel`` carries each hypothesis's ancestry as a one-hot
      slot-selection over (slot, position): ``sel[b, k, j, t'] = 1`` iff
      the token of hypothesis k's prefix at position t' lives in slot j.
      Self-attention scores every slot (K x more MXU FLOPs — negligible)
      and masks by ``sel``; the beam shuffle only permutes ``sel``
      (~2 MB) instead of the caches.
    - Cache layout folds the (position, slot) axes into one length-
      Tmax*K axis, POSITION-major (flat index m = t*K + j), keeping
      (nh, hd) minor — (B, Tmax*K, nh, hd) per layer.  Position-major
      makes the K slot-writes of a step CONTIGUOUS: one
      dynamic_update_slice per cache per layer.  With slot-major
      (m = j*Tmax + t) the K strided writes compiled to 30 full-cache
      update fusions per step — ~9 GB/step of pointless cache rewrite
      (measured ~9-11 ms/step; this form is ~2 ms).
    - Layers are SEPARATE pytree leaves (tuples of L arrays), NOT one
      stacked (L, ...) array: updating a stacked cache with
      ``dynamic_update_slice(cache, new[None], (i, ...))`` and slicing
      ``cache[i]`` back out inside the decode while_loop defeated XLA's
      in-place carry updates — the step ran 14.2 ms vs 2.3 ms with
      per-layer leaves (6.3x, the dominant decode cost; measured on
      v5e-1 at B=256 K=5, /tmp bisection harness, round 3)."""

    k_cache: tuple       # L x (B, Tmax*K, nh, hd) — fixed physical slots
    v_cache: tuple       # L x (B, Tmax*K, nh, hd)
    k_mem: tuple         # L x (B, S, nh, hd) — precomputed cross K (shared)
    v_mem: tuple         # L x (B, S, nh, hd)
    sel: jax.Array       # (B, K, Tmax, K) — ancestry slot selection
    t: jax.Array         # () int32 — current step
    # int8 decode memory (ops/quant.py): under "decoder_mem" the
    # cross-attn K/V memory is stored int8; under "decoder_kv" the
    # growing self-attn caches are too (see the MEASURED VERDICT in
    # ops/quant.py — a loss at small head dims).  These hold the
    # per-vector f32 scales (caches: L x (B, Tmax*K, nh); memory:
    # L x (B, S, nh)).  Empty tuples outside the contexts — ``step``
    # detects the mode from the buffer dtypes, so the trace is
    # self-describing.
    k_scales: tuple = ()
    v_scales: tuple = ()
    k_mem_scales: tuple = ()
    v_mem_scales: tuple = ()


def _mha(q, k, v, nheads, mask=None):
    """Multi-head attention. q: (B,Tq,d), k/v: (B,Tk,nh,hd); softmax in f32."""
    B, Tq, d = q.shape
    hd = d // nheads
    q = q.reshape(B, Tq, nheads, hd)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    attn = attn.astype(jnp.float32)
    if mask is not None:
        attn = jnp.where(mask, attn, -jnp.inf)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(B, Tq, d)


class TransformerDecoder(nn.Module):
    num_classes: int
    d_model: int = 256
    nhead: int = 8
    num_decoder_layers: int = 3
    dim_feedforward: int = 1024
    dropout: float = 0.3
    max_seq_len: int = 150
    padding_idx: int = 0
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        d, V, L = self.d_model, self.num_classes, self.num_decoder_layers
        f32 = jnp.float32
        self.word_embed = self.param("word_embed", trunc_init, (V, d), f32)
        pe = word_posenc(self.max_seq_len + 8, d)
        self.pos_table = jnp.asarray(pe)

        def p(name, shape, init=xavier):
            return self.param(name, init, shape, f32)

        layers = []
        for i in range(L):
            layers.append(
                {
                    # self-attention
                    "sa_wq": p(f"l{i}_sa_wq", (d, d)),
                    "sa_wk": p(f"l{i}_sa_wk", (d, d)),
                    "sa_wv": p(f"l{i}_sa_wv", (d, d)),
                    "sa_wo": p(f"l{i}_sa_wo", (d, d)),
                    "sa_bq": p(f"l{i}_sa_bq", (d,), nn.initializers.zeros),
                    "sa_bk": p(f"l{i}_sa_bk", (d,), nn.initializers.zeros),
                    "sa_bv": p(f"l{i}_sa_bv", (d,), nn.initializers.zeros),
                    "sa_bo": p(f"l{i}_sa_bo", (d,), nn.initializers.zeros),
                    # cross-attention
                    "ca_wq": p(f"l{i}_ca_wq", (d, d)),
                    "ca_wk": p(f"l{i}_ca_wk", (d, d)),
                    "ca_wv": p(f"l{i}_ca_wv", (d, d)),
                    "ca_wo": p(f"l{i}_ca_wo", (d, d)),
                    "ca_bq": p(f"l{i}_ca_bq", (d,), nn.initializers.zeros),
                    "ca_bk": p(f"l{i}_ca_bk", (d,), nn.initializers.zeros),
                    "ca_bv": p(f"l{i}_ca_bv", (d,), nn.initializers.zeros),
                    "ca_bo": p(f"l{i}_ca_bo", (d,), nn.initializers.zeros),
                    # FFN + norms (post-LN like torch TransformerDecoderLayer)
                    "ff_w1": p(f"l{i}_ff_w1", (d, self.dim_feedforward)),
                    "ff_b1": p(f"l{i}_ff_b1", (self.dim_feedforward,), nn.initializers.zeros),
                    "ff_w2": p(f"l{i}_ff_w2", (self.dim_feedforward, d)),
                    "ff_b2": p(f"l{i}_ff_b2", (d,), nn.initializers.zeros),
                    "n1_s": p(f"l{i}_n1_s", (d,), nn.initializers.ones),
                    "n1_b": p(f"l{i}_n1_b", (d,), nn.initializers.zeros),
                    "n2_s": p(f"l{i}_n2_s", (d,), nn.initializers.ones),
                    "n2_b": p(f"l{i}_n2_b", (d,), nn.initializers.zeros),
                    "n3_s": p(f"l{i}_n3_s", (d,), nn.initializers.ones),
                    "n3_b": p(f"l{i}_n3_b", (d,), nn.initializers.zeros),
                }
            )
        self.layers = layers
        self.w_proj = self.param("w_proj", xavier, (d, V), f32)
        self.b_proj = self.param("b_proj", nn.initializers.zeros, (V,), f32)

    # ------------------------------------------------------------------
    def _ln(self, x, scale, bias):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def _embed(self, ids):
        emb = self.word_embed[ids] * (ids != self.padding_idx)[..., None]
        emb = emb * np.sqrt(self.d_model)
        T = ids.shape[-1]
        return emb + self.pos_table[:T]

    def _heads(self, x, w, b):
        B, T, d = x.shape
        return (x @ w + b).reshape(B, T, self.nhead, d // self.nhead)

    # ------------------------------------------------------------------
    def __call__(self, memory, tgt_ids, train: bool = True):
        """Teacher-forced causal pass: logits (B, T, V)."""
        B, T = tgt_ids.shape
        x = self._embed(tgt_ids)
        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]  # (1,1,T,T)
        if train:
            # padding mask (reference masks pads only in training, tfm.py:88-91).
            # Key 0 stays visible unconditionally: real rows carry [GO] there
            # (never PAD), and all-PAD filler rows — e.g. data-axis batch
            # padding — would otherwise softmax over an all -inf row -> NaN
            # that poisons the whole batch's loss through the masked mean.
            not_pad = (tgt_ids != self.padding_idx)[:, None, None, :]
            first = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, T), 3) == 0
            mask = causal & (not_pad | first)
        else:
            mask = causal
        mem = memory.astype(self.dtype)

        if train and self.dropout > 0.0:
            rng = self.make_rng("dropout")

            def drop(x, deterministic=False):
                nonlocal rng
                rng, sub = jax.random.split(rng)
                keep = 1.0 - self.dropout
                m = jax.random.bernoulli(sub, keep, x.shape)
                return jnp.where(m, x / keep, 0.0)

        else:

            def drop(x, deterministic=True):
                return x

        for lp in self.layers:
            h = _mha(
                (x @ lp["sa_wq"] + lp["sa_bq"]).astype(self.dtype),
                self._heads(x.astype(self.dtype), lp["sa_wk"], lp["sa_bk"]),
                self._heads(x.astype(self.dtype), lp["sa_wv"], lp["sa_bv"]),
                self.nhead,
                mask,
            ) @ lp["sa_wo"] + lp["sa_bo"]
            h = drop(h)
            x = self._ln(x + h, lp["n1_s"], lp["n1_b"])
            h = _mha(
                (x @ lp["ca_wq"] + lp["ca_bq"]).astype(self.dtype),
                self._heads(mem, lp["ca_wk"], lp["ca_bk"]),
                self._heads(mem, lp["ca_wv"], lp["ca_bv"]),
                self.nhead,
            ) @ lp["ca_wo"] + lp["ca_bo"]
            h = drop(h)
            x = self._ln(x + h, lp["n2_s"], lp["n2_b"])
            h = nn.relu((x.astype(self.dtype) @ lp["ff_w1"] + lp["ff_b1"]))
            h = drop(h)
            h = h @ lp["ff_w2"] + lp["ff_b2"]
            h = drop(h)
            x = self._ln(x + h, lp["n3_s"], lp["n3_b"])
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, shard_activation

        return shard_activation(
            x @ self.w_proj + self.b_proj, (DATA_AXIS, None, MODEL_AXIS)
        )

    # ------------------------------------------------------------------
    def init_state(
        self,
        memory,
        max_steps: int,
        beam_size: int = 1,
        live_steps: int | None = None,
    ) -> TFMState:
        """Allocate KV caches and precompute cross-attention K/V.

        ``memory`` is the UNexpanded (B, S, D) encoder output; only the
        per-beam self-attention caches are allocated at B*beam_size rows
        (beam layout: sample-major, beams of a sample contiguous).

        ``live_steps`` caps the initial cache capacity for CHUNKED decode
        (``decode/runner.py``): every decode step streams the whole slot
        axis, so steps t < live_steps only pay for live positions; the
        caller grows the caches with ``grow_decode_state`` before decoding
        past the cap.  ``sel`` is always full-length (it is tiny)."""
        B, S, _ = memory.shape
        L, nh = self.num_decoder_layers, self.nhead
        hd = self.d_model // nh
        cap = max_steps if live_steps is None else min(live_steps, max_steps)
        mem = memory.astype(self.dtype)
        # per-layer TUPLES, not a stacked (L, ...) array — see TFMState
        k_mem = tuple(
            self._heads(mem, lp["ca_wk"], lp["ca_bk"]).astype(self.dtype)
            for lp in self.layers
        )
        v_mem = tuple(
            self._heads(mem, lp["ca_wv"], lp["ca_bv"]).astype(self.dtype)
            for lp in self.layers
        )
        from ..ops.quant import quant_part_active, quantize_kv

        qmem = quant_part_active("decoder_mem")
        qkv = quant_part_active("decoder_kv")
        k_mem_scales = v_mem_scales = ()
        k_scales = v_scales = ()
        if qmem:
            # cross-attn memory: quantized ONCE here (zero per-step cost),
            # then streamed int8 by every decode step; scale folding in
            # ops/decode_attention keeps the reduce int8-fed
            k_mem, k_mem_scales = zip(*(quantize_kv(k) for k in k_mem))
            v_mem, v_mem_scales = zip(*(quantize_kv(v) for v in v_mem))
        if qkv:
            # growing self-attn caches int8 — see the decoder_kv MEASURED
            # VERDICT in ops/quant.py before enabling at small head dims
            scale_zeros = jnp.zeros((B, cap * beam_size, nh), jnp.float32)
            k_scales = tuple(scale_zeros for _ in range(L))
            v_scales = tuple(scale_zeros for _ in range(L))
        zeros = jnp.zeros(
            (B, cap * beam_size, nh, hd), jnp.int8 if qkv else self.dtype
        )
        k_cache = tuple(zeros for _ in range(L))
        v_cache = tuple(zeros for _ in range(L))
        sel = jnp.zeros((B, beam_size, max_steps, beam_size), self.dtype)
        return TFMState(
            k_cache, v_cache, k_mem, v_mem, sel, jnp.int32(0),
            k_scales, v_scales, k_mem_scales, v_mem_scales,
        )

    def step(self, state: TFMState, tokens) -> tuple[TFMState, jax.Array]:
        """One decode step: tokens (B*K,) -> (state, logits (B*K, V))."""
        BK = tokens.shape[0]
        Bs = state.k_mem[0].shape[0]  # shared batch dim of the memory
        K = BK // Bs                  # beam width folded into the rows
        nh, hd = self.nhead, self.d_model // self.nhead
        t = state.t
        emb = self.word_embed[tokens] * (tokens != self.padding_idx)[..., None]
        # x stays 2-D (BK, d) through the whole step: a (BK, 1, d) carry
        # turns every projection into BK batched M=1 matvecs instead of
        # one (BK, d) @ (d, d) matmul.  2.7x on an isolated-step micro
        # harness; NEUTRAL inside the full 150-step while_loop (9.5 ms/step
        # either way — the loop body's cost is elsewhere, see
        # tools/tfm_decode_profile.py), kept for the cleaner matmul form.
        x = emb * np.sqrt(self.d_model) + self.pos_table[t]      # (BK, d)

        M = state.k_cache[0].shape[1]            # Tmax * K positions
        Tmax = M // K
        # the slot holding position t is the hypothesis's own: record the
        # identity row, so after the shuffle permutes sel the entry
        # becomes one-hot at the parent's slot (the slot that wrote it)
        eye_row = jnp.broadcast_to(
            jnp.eye(K, dtype=state.sel.dtype)[None, :, None, :], (Bs, K, 1, K)
        )
        sel = jax.lax.dynamic_update_slice(state.sel, eye_row, (0, 0, t, 0))
        # ancestry mask over flat positions m = t'*K + j: sel one-hot
        # AND t'<=t, flattened position-major to match the cache fold.
        # sel is full-length; under chunked decode the cache (and hence
        # Tmax here) covers only the live prefix — slice sel to match
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Tmax, 1), 2)
        sel_live = jax.lax.slice_in_dim(sel, 0, Tmax, axis=2)
        sel_mask = (sel_live > 0.5) & (pos <= t)  # (Bs, k_hyp, t', j)
        sel_mask = sel_mask.reshape(Bs, K, M)    # flat positions m = t'*K+j

        k_cache, v_cache = [], []
        k_scales, v_scales = [], []
        # int8 decode memory (ops/quant.py decoder_mem): detected from the
        # buffer dtype so the trace is self-describing.  The int8 HBM read
        # is the win; the dequant convert+multiply fuses into the
        # streaming attention reduce (same pattern as decoder_lstm.step)
        qkv = state.k_cache[0].dtype == jnp.int8
        qmem = state.k_mem[0].dtype == jnp.int8
        if qkv:
            from ..ops.quant import quantize_kv  # noqa: F401 (used below)

        # beam-split head projection: (BK, d) -> (Bs, K, nh, hd)
        def heads(y, w, b):
            return (y @ w + b).reshape(Bs, K, self.nhead, hd)

        for i, lp in enumerate(self.layers):
            xq = x.astype(self.dtype)            # (BK, d)
            # new K/V cast to the cache dtype BEFORE the update: an f32
            # value scattered into a bf16 buffer breaks XLA's in-place
            # carry update (full-cache copy per step) and is a future error
            k_new = heads(xq, lp["sa_wk"], lp["sa_bk"]).astype(self.dtype)
            v_new = heads(xq, lp["sa_wv"], lp["sa_bv"]).astype(self.dtype)
            if qkv:
                k_new, k_sc = quantize_kv(k_new)   # int8 + (Bs, K, nh) f32
                v_new, v_sc = quantize_kv(v_new)
                k_scales.append(jax.lax.dynamic_update_slice(
                    state.k_scales[i], k_sc, (0, t * K, 0)
                ))
                v_scales.append(jax.lax.dynamic_update_slice(
                    state.v_scales[i], v_sc, (0, t * K, 0)
                ))
            # hypothesis in slot j writes flat position t*K + j — the K
            # slot-writes of a step are CONTIGUOUS: one slice update per
            # cache (slot-major needed K strided updates, which compiled
            # to full-cache rewrite fusions — ~9 GB/step).  Each layer's
            # cache is its OWN carry leaf: a stacked (L, ...) update +
            # slice-back broke in-place updates (14.2 -> 2.3 ms/step)
            k_i = jax.lax.dynamic_update_slice(
                state.k_cache[i], k_new, (0, t * K, 0, 0)
            )
            v_i = jax.lax.dynamic_update_slice(
                state.v_cache[i], v_new, (0, t * K, 0, 0)
            )
            k_cache.append(k_i)
            v_cache.append(v_i)
            # slot attention: score EVERY flat position m (K x FLOPs) and
            # select the hypothesis's ancestry via the mask — the cache is
            # read once, never permuted (see ops/decode_attention.py)
            scale = np.float32(1.0 / np.sqrt(hd))
            qh = (heads(xq, lp["sa_wq"], lp["sa_bq"]) * scale).astype(
                self.dtype
            )
            ctx = decode_attention(
                qh, k_i, v_i, sel_mask,
                k_scale=k_scales[i] if qkv else None,
                v_scale=v_scales[i] if qkv else None,
            )
            h = ctx.reshape(BK, self.d_model) @ lp["sa_wo"] + lp["sa_bo"]
            x = self._ln(x + h, lp["n1_s"], lp["n1_b"])
            # cross-attention against the SHARED memory: fold the beam
            # axis into the query so K/V are read once per sample, not
            # once per beam; same kernel, no mask
            qh = (
                heads(x.astype(self.dtype), lp["ca_wq"], lp["ca_bq"])
                * scale
            ).astype(self.dtype)
            ctx = decode_attention(
                qh, state.k_mem[i], state.v_mem[i],
                k_scale=state.k_mem_scales[i] if qmem else None,
                v_scale=state.v_mem_scales[i] if qmem else None,
            )
            h = ctx.reshape(BK, self.d_model) @ lp["ca_wo"] + lp["ca_bo"]
            x = self._ln(x + h, lp["n2_s"], lp["n2_b"])
            h = nn.relu(x.astype(self.dtype) @ lp["ff_w1"] + lp["ff_b1"])
            h = h @ lp["ff_w2"] + lp["ff_b2"]
            x = self._ln(x + h, lp["n3_s"], lp["n3_b"])
        logits = (x @ self.w_proj + self.b_proj).astype(jnp.float32)
        from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, shard_activation

        logits = shard_activation(logits, (DATA_AXIS, MODEL_AXIS))
        new_state = state._replace(
            k_cache=tuple(k_cache), v_cache=tuple(v_cache), sel=sel, t=t + 1,
            k_scales=tuple(k_scales), v_scales=tuple(v_scales),
        )
        return new_state, logits


def grow_decode_state(
    state: TFMState, new_steps: int, beam_size: int
) -> TFMState:
    """Zero-pad the KV caches to ``new_steps * beam_size`` slots.

    Chunked-decode support: ``step`` streams the ENTIRE slot axis of the
    caches every step, so decoding with full-length caches pays for
    max_steps positions from step 0.  ``decode/runner.py`` instead starts
    with short caches (``init_state(live_steps=...)``) and grows them
    between sequential decode chunks — the per-step HBM read and attention
    math then scale with the live prefix (~0.6x of full-length on average
    at 5 chunks).  A pure pad: slot m of the grown cache holds the same
    (position, slot) as before (flat index m = t*K + j), and ``sel`` was
    allocated full-length, so decode results are exactly unchanged."""
    m_new = new_steps * beam_size
    m_old = state.k_cache[0].shape[1]
    if m_new <= m_old:
        return state
    pad = ((0, 0), (0, m_new - m_old), (0, 0), (0, 0))
    grown = state._replace(
        k_cache=tuple(jnp.pad(c, pad) for c in state.k_cache),
        v_cache=tuple(jnp.pad(c, pad) for c in state.v_cache),
    )
    if state.k_scales:
        # int8 decode memory: per-vector scale tensors (B, M, nh) grow in
        # lockstep with the caches (pad scale 0 -> dequant of the padded
        # slots stays exactly 0, same as the bf16 zero-pad)
        spad = pad[:-1]
        grown = grown._replace(
            k_scales=tuple(jnp.pad(s, spad) for s in state.k_scales),
            v_scales=tuple(jnp.pad(s, spad) for s in state.v_scales),
        )
    return grown
