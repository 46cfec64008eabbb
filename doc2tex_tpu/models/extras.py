"""Demo-fork model components (the HybridViT extras).

The reference demo vendors a fork of the main module tree with extra
components that exist nowhere else (SURVEY.md 2.8); this module provides
them in one place instead of a fork:

- ``Maxout`` (``demo/HybridViT/module/component/common/maxout.py:4``)
- ``DepthwiseSeparableConv`` / ``ConvModule``
  (``.../common/conv.py:26-79``)
- ``ASPP`` (``.../feature_extractor/addon_module/aspp.py:8-28``)
- ``LocationAwareAttention2DCell`` + ``SARDecoderCell``
  (``.../prediction_head/addon_module/attention2D.py:10-99``)
- ``ClovaResNetFeatureExtractor``
  (``.../feature_extractor/clova_impl/resnet.py:296``)
- ``ConfigurableVGG`` (timm-style VGG w/ down_sample cfg,
  ``.../feature_extractor/vgg.py:7-230``)
- ``LearnedResizer`` (width-bucket predictor, ``demo/app.py:53-66``)
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Maxout(nn.Module):
    """Max over fixed-size pools of the last dim."""

    pool_size: int

    def __call__(self, x):
        *lead, last = x.shape
        return x.reshape(*lead, last // self.pool_size, self.pool_size).max(-1)


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (reference conv.py:26-50)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = nn.Conv(
            C, self.kernel, strides=self.strides, feature_group_count=C,
            dtype=self.dtype,
        )(x)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype)(x)


class ConvModule(nn.Module):
    """conv + BN + relu block (reference conv.py:53-79)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        return nn.relu(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference aspp.py): parallel dilated
    3x3 branches + 1x1 + global-pool branch, concat, 1x1 project."""

    features: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        branches = []
        for d in self.dilations:
            k = (1, 1) if d == 1 else (3, 3)
            branches.append(
                nn.relu(
                    nn.Conv(
                        self.features, k, kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype,
                    )(x)
                )
            )
        gp = x.mean(axis=(1, 2), keepdims=True)
        gp = nn.relu(nn.Conv(self.features, (1, 1), dtype=self.dtype)(gp))
        branches.append(jnp.broadcast_to(gp, (B, H, W, self.features)))
        out = jnp.concatenate(branches, axis=-1)
        out = nn.relu(nn.Conv(self.features, (1, 1), dtype=self.dtype)(out))
        if train and self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=False)
        return out


class LocationAwareAttention2DCell(nn.Module):
    """2D location-aware additive attention scores
    (reference attention2D.py:52-99): conv over the previous 2D alignment
    map feeds the score MLP alongside key and query projections."""

    hidden_dim: int
    kernel_size: int = 2
    kernel_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, enc_2d, last_alignment):
        """hidden (B, H); enc_2d (B, h, w, D); last_alignment (B, h, w).
        Returns (context (B, D), alignment (B, h, w))."""
        B, h, w, D = enc_2d.shape
        key = nn.Dense(self.hidden_dim, dtype=self.dtype)(enc_2d)
        query = nn.Dense(self.hidden_dim, dtype=self.dtype)(hidden)
        k = 2 * self.kernel_size + 1
        loc = nn.Conv(self.kernel_dim, (k, k), dtype=self.dtype)(
            last_alignment[..., None]
        )
        loc = nn.Dense(self.hidden_dim, dtype=self.dtype)(loc)
        score = nn.Dense(1, dtype=self.dtype)(
            jnp.tanh(key + query[:, None, None, :] + loc)
        )[..., 0]
        alignment = jax.nn.softmax(
            score.reshape(B, h * w).astype(jnp.float32), axis=-1
        ).reshape(B, h, w)
        context = jnp.einsum("bhw,bhwd->bd", alignment, enc_2d)
        return context, alignment


class SARDecoderCell(nn.Module):
    """SAR-style 2-layer LSTM decode cell with 2D conv attention
    (reference attention2D.py:10-49): query from the 2nd LSTM hidden
    broadcast over the feature map, key via 3x3 conv, tanh-add scoring."""

    input_size: int
    attention_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dec_input, feature_map, carry):
        """dec_input (B, E); feature_map (B, h, w, C);
        carry = ((h1, c1), (h2, c2)).  Returns (context, alignment, carry)."""
        (h1, c1), (h2, c2) = carry
        cell1 = nn.LSTMCell(self.input_size, dtype=self.dtype, name="lstm1")
        cell2 = nn.LSTMCell(self.input_size, dtype=self.dtype, name="lstm2")
        (c1, h1), _ = cell1((c1, h1), dec_input)
        (c2, h2), _ = cell2((c2, h2), h1)

        query = nn.Conv(self.attention_size, (1, 1), dtype=self.dtype)(
            h2[:, None, None, :]
        )
        key = nn.Conv(self.attention_size, (3, 3), dtype=self.dtype)(feature_map)
        score = nn.Conv(1, (1, 1), dtype=self.dtype)(jnp.tanh(query + key))[..., 0]
        B, h, w = score.shape
        alignment = jax.nn.softmax(
            score.reshape(B, h * w).astype(jnp.float32), -1
        ).reshape(B, h, w)
        context = jnp.einsum("bhw,bhwc->bc", alignment, feature_map)
        return context, alignment, ((h1, c1), (h2, c2))


class ClovaResNetFeatureExtractor(nn.Module):
    """Clova deep-text-recognition ResNet (reference clova_impl/resnet.py:
    296): conv stem, 4 residual stages with asymmetric pooling, output
    (B, H/16-ish, W/4+1, output_channel)."""

    input_channel: int = 1
    output_channel: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.output_channel
        chans = [oc // 8, oc // 4, oc // 2, oc]

        def convbn(x, f, k=(3, 3), s=(1, 1), p="SAME"):
            x = nn.Conv(f, k, strides=s, padding=p, use_bias=False,
                        dtype=self.dtype)(x)
            return nn.BatchNorm(use_running_average=not train,
                                dtype=jnp.float32)(x)

        def block(x, f):
            r = x
            y = nn.relu(convbn(x, f))
            y = convbn(y, f)
            if r.shape[-1] != f:
                r = convbn(r, f, k=(1, 1))
            return nn.relu(y + r)

        x = nn.relu(convbn(x, chans[0] // 2))
        x = nn.relu(convbn(x, chans[0]))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = block(x, chans[0])
        x = nn.relu(convbn(x, chans[0]))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = block(x, chans[1])
        x = nn.relu(convbn(x, chans[1]))
        x = nn.max_pool(x, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1)))
        x = block(x, chans[2])
        x = nn.relu(convbn(x, chans[2]))
        x = block(x, chans[3])
        x = nn.relu(convbn(x, chans[3], k=(2, 2), s=(2, 1), p=((0, 0), (1, 1))))
        x = nn.relu(convbn(x, chans[3], k=(2, 2), s=(1, 1), p="VALID"))
        return x


class ConfigurableVGG(nn.Module):
    """timm-style VGG with per-stage down_sample config
    (reference vgg.py:7-230): each stage is n convs + a pool whose stride
    comes from ``down_sample`` so width can be preserved."""

    stages: Sequence[Sequence[int]] = ((64,), (128,), (256, 256), (512, 512))
    down_sample: Sequence[tuple[int, int]] = ((2, 2), (2, 2), (2, 1), (2, 1))
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for convs, ds in zip(self.stages, self.down_sample):
            for f in convs:
                x = nn.Conv(f, (3, 3), dtype=self.dtype)(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=jnp.float32)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=ds, padding="SAME")
        return x


class LearnedResizer(nn.Module):
    """Small ResNet predicting the best target-width bucket for an input
    crop (reference demo/app.py:53-66: timm ResNetV2 [2,3,3] with
    num_classes = 672/32 = 21 width buckets)."""

    num_buckets: int = 21
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def block(x, f, s):
            r = x
            y = nn.Conv(f, (3, 3), strides=(s, s), use_bias=False,
                        dtype=self.dtype)(x)
            y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
            y = nn.relu(y)
            y = nn.Conv(f, (3, 3), use_bias=False, dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
            if r.shape[-1] != f or s != 1:
                r = nn.Conv(f, (1, 1), strides=(s, s), dtype=self.dtype)(x)
            return nn.relu(y + r)

        x = nn.Conv(self.width, (7, 7), strides=(2, 2), dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for i, n in enumerate((2, 3, 3)):
            f = self.width * (2**i)
            for j in range(n):
                x = block(x, f, 2 if (j == 0 and i > 0) else 1)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_buckets, dtype=jnp.float32)(x)
