"""SSD512 math detector in flax.

Parity target: reference ScanSSD ``SSD`` (``demo/ScanSSD/ssd.py:30-258``):
VGG16 base (ceil-mode pool at stage 3, pool5 3x3/s1, dilated conv6 + conv7),
L2Norm(scale 20) on conv4_3, 'S'-strided extra layers, and (1,5)-kernel
loc/conf heads (the demo's DetectCfg, ``demo/app.py:26-27``) over 7 source
maps.  Output layout matches the reference flatten order (per-map
NHWC-flattened loc/conf), so priors line up index-for-index.

TPU-native: one jitted forward over a batch of 512x512 windows; the decode
+ NMS run on device in ``boxes.py`` instead of the reference's per-window
CPU loops.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .priors import MATH_GTDB_512

Dtype = Any

VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "C", 512, 512, 512, "M",
           512, 512, 512]


class L2Norm(nn.Module):
    """Channel L2 normalization with learned scale (reference l2norm.py)."""

    channels: int
    scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "weight", nn.initializers.constant(self.scale), (self.channels,)
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), -1,
                                keepdims=True)) + 1e-10
        return (x / norm) * gamma


def _pool(x, ceil: bool = False):
    if ceil:
        h, w = x.shape[1], x.shape[2]
        ph, pw = h % 2, w % 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class SSD512(nn.Module):
    """SSD512 over 512x512 windows; returns (loc (B, N, 4),
    conf (B, N, num_classes)) aligned index-for-index with ``make_priors``."""

    num_classes: int = 2
    head_kernel: tuple[int, int] = (1, 5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.quant import maybe_conv_general

        cfg = MATH_GTDB_512
        # int8 under an active quantized_inference("encoder") trace: the
        # 512-channel VGG trunk convs are exactly the shapes the int8
        # microbench gains 1.39x on (tools/int8_microbench.py); the
        # shape gate inside int8_conv keeps the small heads bf16/f32
        conv = lambda f, k, **kw: nn.Conv(
            f, k, dtype=self.dtype,
            conv_general_dilated=maybe_conv_general(), **kw)
        relu = nn.relu

        # stage 1
        x = relu(conv(64, (3, 3))(x))
        x = relu(conv(64, (3, 3))(x))
        x = _pool(x)                      # 256
        # stage 2
        x = relu(conv(128, (3, 3))(x))
        x = relu(conv(128, (3, 3))(x))
        x = _pool(x)                      # 128
        # stage 3 (+ceil pool)
        for _ in range(3):
            x = relu(conv(256, (3, 3))(x))
        x = _pool(x, ceil=True)           # 64
        # stage 4 -> conv4_3 tap
        for _ in range(3):
            x = relu(conv(512, (3, 3))(x))
        conv4_3 = x                        # (B, 64, 64, 512)
        x = _pool(x)                      # 32
        # stage 5 + pool5(3x3 s1) + dilated fc6/fc7
        for _ in range(3):
            x = relu(conv(512, (3, 3))(x))
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        x = relu(conv(1024, (3, 3), kernel_dilation=(6, 6))(x))  # conv6
        x = relu(conv(1024, (1, 1))(x))                          # conv7
        fc7 = x                            # (B, 32, 32, 1024)

        sources = [L2Norm(512)(conv4_3), fc7]

        # extras: (1x1 reduce, 3x3 stride-2) pairs -> 16, 8, 4, 2
        for ch_red, ch_out in ((256, 512), (128, 256), (128, 256), (128, 256)):
            x = relu(conv(ch_red, (1, 1))(x))
            x = relu(conv(ch_out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x))
            sources.append(x)
        # final 1x1 + 4x4 pad 1 -> 1x1 map (reference add_extras size==512 tail)
        x = relu(conv(128, (1, 1))(x))
        x = relu(conv(256, (4, 4), padding=((1, 1), (1, 1)))(x))
        sources.append(x)

        locs, confs = [], []
        kh, kw = self.head_kernel
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        for k, src in enumerate(sources):
            nb = cfg["mbox"][k]
            loc = conv(nb * 4, (kh, kw), padding=pad)(src)
            cf = conv(nb * self.num_classes, (kh, kw), padding=pad)(src)
            B = src.shape[0]
            locs.append(loc.reshape(B, -1, 4))
            confs.append(cf.reshape(B, -1, self.num_classes))
        return jnp.concatenate(locs, 1), jnp.concatenate(confs, 1)
