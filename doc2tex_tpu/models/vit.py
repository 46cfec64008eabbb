"""ViT encoders with hybrid CNN patch embedding.

Parity targets in the reference:
- PatchEmbed / HybridEmbed: ``doc2tex/modules/component/seq_modeling/
  addon_module/patchembed.py:9-141``
- ViTEncoder family (V1 interpolated / V2 truncated / V3 fixed sincos):
  ``doc2tex/modules/component/seq_modeling/vit_encoder.py:22-317``

TPU-native differences:
- The reference probes the backbone's output size with a dry forward at
  init (``patchembed.py:75-85``); we use static conv arithmetic
  (``resnet.feature_hw``) — shapes are compile-time constants.
- V1's bicubic pos-embed interpolation happens on fixed bucket shapes, so
  it is traced once per bucket (jax.image.resize), not per sample.
- All sequence shapes are static per bucket: a bucket (H, W) maps to a
  fixed patch count N = ceil(fh/p) * ceil(fw/p).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Block, sincos_2d_posembed, trunc_init
from .resnet import ResNetFeatureExtractor, feature_hw
from .vgg import VGGFeatureExtractor

Dtype = Any


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def grid_size_for(
    img_hw: tuple[int, int],
    patch: tuple[int, int],
    backbone: Optional[str],
    patching_style: str = "2d",
) -> tuple[int, int]:
    """Patch-grid size for an input image shape (static shape contract)."""
    if backbone == "resnet":
        fh, fw = feature_hw(*img_hw)
    elif backbone is None:
        fh, fw = img_hw
    else:
        raise ValueError(f"unknown backbone {backbone!r}")
    if patching_style == "1d":
        return 1, _ceil_to(fw, patch[1]) // patch[1]
    return _ceil_to(fh, patch[0]) // patch[0], _ceil_to(fw, patch[1]) // patch[1]


class HybridEmbed(nn.Module):
    """CNN backbone -> pad to patch multiple -> conv proj (reference
    patchembed.py:51-141).  Returns (tokens (B,N,D), grid (gh,gw))."""

    patch_size: tuple[int, int]
    embed_dim: int
    backbone_name: str = "resnet"
    backbone_channels: int = 512
    input_channel: int = 1
    gcb: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backbone_name == "resnet":
            feat = ResNetFeatureExtractor(
                input_channel=self.input_channel,
                output_channel=self.backbone_channels,
                gcb=self.gcb,
                dtype=self.dtype,
            )(x, train)
        elif self.backbone_name == "vgg":
            feat = VGGFeatureExtractor(
                input_channel=self.input_channel,
                output_channel=self.backbone_channels,
                dtype=self.dtype,
            )(x, train)
        else:
            raise ValueError(f"unknown backbone {self.backbone_name!r}")
        B, fh, fw, C = feat.shape
        ph, pw = self.patch_size
        pad_h = _ceil_to(fh, ph) - fh
        pad_w = _ceil_to(fw, pw) - fw
        if pad_h or pad_w:
            feat = jnp.pad(feat, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        gh, gw = (fh + pad_h) // ph, (fw + pad_w) // pw
        from ..ops.quant import maybe_conv_general

        tokens = nn.Conv(
            self.embed_dim,
            self.patch_size,
            strides=self.patch_size,
            padding="VALID",
            dtype=self.dtype,
            kernel_init=trunc_init,
            conv_general_dilated=maybe_conv_general(),
        )(feat)
        return tokens.reshape(B, gh * gw, self.embed_dim), (gh, gw)


class HybridEmbed1D(nn.Module):
    """TRIG-style 1D patching (reference patchembed.py:144-236, from
    arXiv:2111.08314): CNN backbone -> per-row width-window Conv1d with
    shared weights -> mean over height -> (B, W', D) sequence.

    TPU-native: the per-row Python loop collapses to ONE Conv with kernel
    (1, w) stride (1, w) over the 2D map (identical math, one MXU op)."""

    patch_width: int
    embed_dim: int
    backbone_name: str = "resnet"
    backbone_channels: int = 512
    input_channel: int = 1
    gcb: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backbone_name == "resnet":
            feat = ResNetFeatureExtractor(
                input_channel=self.input_channel,
                output_channel=self.backbone_channels,
                gcb=self.gcb,
                dtype=self.dtype,
            )(x, train)
        else:
            feat = VGGFeatureExtractor(
                input_channel=self.input_channel,
                output_channel=self.backbone_channels,
                dtype=self.dtype,
            )(x, train)
        B, fh, fw, C = feat.shape
        pad_w = _ceil_to(fw, self.patch_width) - fw
        if pad_w:
            feat = jnp.pad(feat, ((0, 0), (0, 0), (0, pad_w), (0, 0)))
        gw = (fw + pad_w) // self.patch_width
        tokens = nn.Conv(
            self.embed_dim,
            (1, self.patch_width),
            strides=(1, self.patch_width),
            padding="VALID",
            dtype=self.dtype,
            kernel_init=trunc_init,
        )(feat)                       # (B, fh, gw, D)
        tokens = tokens.mean(axis=1)  # mean over height (reference :229)
        return tokens, (1, gw)


class PatchEmbed(nn.Module):
    """Pure conv patch embedding, pads input up to a patch multiple
    (reference patchembed.py:9-48)."""

    patch_size: tuple[int, int]
    embed_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        ph, pw = self.patch_size
        pad_h = _ceil_to(H, ph) - H
        pad_w = _ceil_to(W, pw) - W
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        gh, gw = (H + pad_h) // ph, (W + pad_w) // pw
        tokens = nn.Conv(
            self.embed_dim,
            self.patch_size,
            strides=self.patch_size,
            padding="VALID",
            dtype=self.dtype,
            kernel_init=trunc_init,
        )(x)
        return tokens.reshape(B, gh * gw, self.embed_dim), (gh, gw)


class ViTEncoder(nn.Module):
    """ViT encoder over hybrid or raw patches.

    ``pos_embed_mode`` selects the reference variant:
      'sincos'      -> ViTEncoderV3 (fixed 2D sin-cos, truncated flat)
      'truncate'    -> ViTEncoderV2 (learned, truncated flat)
      'interpolate' -> ViTEncoder   (learned, bicubic 2D resize)

    The learned/fixed table is sized for the max-dimension grid
    (``max_grid``); smaller buckets slice or resize it.  Note the
    truncation is a *flat* prefix slice of the row-major grid — a quirk
    of the reference (vit_encoder.py:260) preserved for weight parity.
    """

    embed_dim: int = 256
    depth: int = 6
    num_heads: int = 8
    patch_size: tuple[int, int] = (2, 2)
    patching_style: str = "2d"   # '2d' | '1d' (TRIG, reference vit_encoder.py:121-204)
    max_grid: tuple[int, int] = (24, 24)
    backbone_name: Optional[str] = "resnet"
    backbone_channels: int = 512
    input_channel: int = 1
    gcb: bool = False
    pos_embed_mode: str = "sincos"
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        deterministic = not train
        if self.patching_style == "1d":
            tokens, grid = HybridEmbed1D(
                self.patch_size[1],
                self.embed_dim,
                backbone_name=self.backbone_name or "resnet",
                backbone_channels=self.backbone_channels,
                input_channel=self.input_channel,
                gcb=self.gcb,
                dtype=self.dtype,
            )(x, train)
        elif self.backbone_name is None:
            tokens, grid = PatchEmbed(
                self.patch_size, self.embed_dim, dtype=self.dtype
            )(x, train)
        else:
            tokens, grid = HybridEmbed(
                self.patch_size,
                self.embed_dim,
                backbone_name=self.backbone_name,
                backbone_channels=self.backbone_channels,
                input_channel=self.input_channel,
                gcb=self.gcb,
                dtype=self.dtype,
            )(x, train)
        B, N, D = tokens.shape

        cls = self.param("cls_token", trunc_init, (1, 1, D))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, D)).astype(tokens.dtype), tokens], axis=1
        )

        max_n = self.max_grid[0] * self.max_grid[1]
        if self.pos_embed_mode == "sincos":
            table = sincos_2d_posembed(D, *self.max_grid, cls_token=True)
            pos = jnp.asarray(table)[: N + 1]
        else:
            pos_param = self.param("pos_embed", trunc_init, (max_n + 1, D))
            if self.pos_embed_mode == "truncate" or grid == tuple(self.max_grid):
                pos = pos_param[: N + 1]
            elif self.pos_embed_mode == "interpolate":
                # DINO-style bicubic resize of the 2D grid (vit_encoder.py:58-95)
                cls_pos = pos_param[:1]
                grid_pos = pos_param[1:].reshape(*self.max_grid, D)
                grid_pos = jax.image.resize(
                    grid_pos.astype(jnp.float32), (grid[0], grid[1], D), "bicubic"
                )
                pos = jnp.concatenate([cls_pos, grid_pos.reshape(N, D)], axis=0)
            else:
                raise ValueError(self.pos_embed_mode)
        tokens = tokens + pos[None].astype(tokens.dtype)
        tokens = nn.Dropout(self.drop_rate)(tokens, deterministic=deterministic)

        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            tokens = Block(
                dim=D,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=float(dpr[i]),
                dtype=self.dtype,
            )(tokens, deterministic)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(tokens)
        return tokens.astype(self.dtype), grid
