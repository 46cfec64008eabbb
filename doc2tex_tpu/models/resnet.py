"""FAN-style ResNet feature extractor, NHWC, flax.linen.

Parity target: reference ``doc2tex/modules/component/feature_extractor/
resnet.py:51-290`` — custom ResNet (BasicBlock x [1,2,5,3]) with asymmetric
pooling so the feature map keeps horizontal resolution:

  stem conv0_1/conv0_2 -> maxpool(2,2) -> layer1 -> conv1
  -> maxpool(2,2) -> layer2 -> conv2
  -> maxpool(k2, s(2,1), p(0,1)) -> layer3 -> conv3
  -> layer4 -> conv4_1(k2, s(2,1), p(0,1)) -> conv4_2(k2, s1, p0)

Output spatial size for input (H, W): (H//16 - 1, W//4 + 1) when H, W are
multiples of 16/4 — the static shape contract used by the ViT hybrid embed
(replaces the reference's dry-forward probe at ``patchembed.py:75-85``).

TPU notes: NHWC layout, bf16 conv compute with f32 BatchNorm statistics.
GlobalContext (GCB) blocks optionally appended per stage, mirroring
``visual_attention.py:105-165``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def feature_hw(h: int, w: int) -> tuple[int, int]:
    """Static output-shape math for the FAN ResNet (replaces dry-forward)."""
    h1, w1 = h // 2, w // 2          # maxpool1
    h2, w2 = h1 // 2, w1 // 2        # maxpool2
    h3 = (h2 - 2) // 2 + 1           # maxpool3: k2 s(2,1) p(0,1)
    w3 = w2 + 1
    h4 = (h3 - 2) // 2 + 1           # conv4_1: k2 s(2,1) p(0,1)
    w4 = w3 + 1
    return h4 - 1, w4 - 1            # conv4_2: k2 s1 p0


class ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.quant import maybe_conv_general

        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=kaiming,
            conv_general_dilated=maybe_conv_general(),
        )(x)
        # BN computes in the module dtype: keeps the conv->bn->relu chain
        # in bf16 on TPU (f32 roundtrips on full-res maps were the encoder
        # bottleneck); stats/params stay f32 via param_dtype defaults.
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return x


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (reference resnet.py:10-48)."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBN(self.planes, strides=(self.stride, self.stride), dtype=self.dtype)(
            x, train
        )
        out = nn.relu(out)
        out = ConvBN(self.planes, dtype=self.dtype)(out, train)
        if self.use_downsample:
            from ..ops.quant import maybe_conv_general

            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, kernel_init=kaiming,
                conv_general_dilated=maybe_conv_general(),
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype,
            )(residual)
        out = nn.relu(out + residual)
        return out


class GCB(nn.Module):
    """GCNet-style global-context attention (reference visual_attention.py:105-165):
    1x1-conv softmax pooling + bottleneck ConvMLP with LayerNorm, additive fuse."""

    channels: int
    ratio: float = 1.0 / 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        mask = nn.Conv(1, (1, 1), dtype=self.dtype)(x).reshape(B, H * W, 1)
        mask = jax.nn.softmax(mask.astype(jnp.float32), axis=1).astype(x.dtype)
        context = jnp.einsum("bnc,bni->bic", x.reshape(B, H * W, C), mask)  # (B,1,C)
        # hidden == C: the reference ConvMLP's `in_channels or hidden_channels`
        # (visual_attention.py:88-89) makes rd_ratio dead code — replicated
        # for weight-import parity
        t = nn.Dense(C, dtype=self.dtype)(context)
        t = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(t)
        t = nn.relu(t)
        t = nn.Dense(C, dtype=self.dtype)(t)
        return x + t.reshape(B, 1, 1, C)


def _maxpool(x, kernel, strides, padding):
    return nn.max_pool(x, kernel, strides=strides, padding=padding)


class FANResNet(nn.Module):
    """The FAN ResNet trunk (reference resnet.py:51-245)."""

    output_channel: int = 512
    layers: tuple[int, ...] = (1, 2, 5, 3)
    gcb: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = [
            self.output_channel // 4,
            self.output_channel // 2,
            self.output_channel,
            self.output_channel,
        ]
        inplanes = self.output_channel // 8

        # stem
        x = ConvBN(self.output_channel // 16, dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = ConvBN(inplanes, dtype=self.dtype)(x, train)
        x = nn.relu(x)

        def stage(x, planes, blocks, current_in):
            for i in range(blocks):
                x = BasicBlock(
                    planes,
                    use_downsample=(i == 0 and current_in != planes),
                    dtype=self.dtype,
                )(x, train)
            if self.gcb:
                x = GCB(planes, dtype=self.dtype)(x, train)
            return x

        x = _maxpool(x, (2, 2), (2, 2), "VALID")
        x = stage(x, oc[0], self.layers[0], inplanes)
        x = ConvBN(oc[0], dtype=self.dtype)(x, train)
        x = nn.relu(x)

        x = _maxpool(x, (2, 2), (2, 2), "VALID")
        x = stage(x, oc[1], self.layers[1], oc[0])
        x = ConvBN(oc[1], dtype=self.dtype)(x, train)
        x = nn.relu(x)

        # maxpool3: kernel 2, stride (2,1), padding (0,1) on W
        x = nn.max_pool(
            x, (2, 2), strides=(2, 1), padding=((0, 0), (1, 1))
        )
        x = stage(x, oc[2], self.layers[2], oc[1])
        x = ConvBN(oc[2], dtype=self.dtype)(x, train)
        x = nn.relu(x)

        x = stage(x, oc[3], self.layers[3], oc[2])

        # conv4_1: k2 s(2,1) p(0,1)
        x = ConvBN(
            oc[3], kernel=(2, 2), strides=(2, 1), padding=((0, 0), (1, 1)),
            dtype=self.dtype,
        )(x, train)
        x = nn.relu(x)
        # conv4_2: k2 s1 p0
        x = ConvBN(
            oc[3], kernel=(2, 2), strides=(1, 1), padding="VALID", dtype=self.dtype
        )(x, train)
        x = nn.relu(x)
        return x


class ResNetFeatureExtractor(nn.Module):
    """Reference ``ResNet_FeatureExtractor`` (resnet.py:248-290)."""

    input_channel: int = 1
    output_channel: int = 512
    gcb: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        return FANResNet(
            output_channel=self.output_channel, gcb=self.gcb, dtype=self.dtype
        )(x, train)
