"""CRNN-style VGG feature extractor (reference
``doc2tex/modules/component/feature_extractor/vgg.py:5-44``), NHWC linen.

Output: (H/16 - 1?, ...) — the reference stack is:
conv3-64 / pool2 / conv3-128 / pool2 / conv3-256 x2 / pool(2,1) /
conv3-512 +BN x2 / pool(2,1) / conv2-512(valid).
Final spatial size for (H, W): (H//16 - 1, W//4 - 1).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class VGGFeatureExtractor(nn.Module):
    input_channel: int = 1
    output_channel: int = 512
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = [
            self.output_channel // 8,
            self.output_channel // 4,
            self.output_channel // 2,
            self.output_channel,
        ]

        def conv(x, f, k=(3, 3), padding="SAME", use_bn=False):
            x = nn.Conv(f, k, padding=padding, use_bias=not use_bn, dtype=self.dtype)(x)
            if use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype,
                )(x)
            return nn.relu(x)

        x = conv(x, oc[0])
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv(x, oc[1])
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = conv(x, oc[2])
        x = conv(x, oc[2])
        x = nn.max_pool(x, (2, 1), strides=(2, 1))
        x = conv(x, oc[3], use_bn=True)
        x = conv(x, oc[3], use_bn=True)
        x = nn.max_pool(x, (2, 1), strides=(2, 1))
        x = conv(x, oc[3], k=(2, 2), padding="VALID")
        return x
