"""DeepLab-v3 style semantic segmentation model (flax).

Model family for the reference's DFQ and AdaRound segmentation baselines
(README.md:124-127 DeepLab-v3 INT8 mIOU; :155-173 W4A8 AdaRound): a
ResNet-style dilated encoder, an ASPP head (parallel atrous convs +
global pooling branch), and a bilinear-upsampled per-pixel classifier.
Compact by default so quantsim/compression acceptance tests run in
seconds; widths/depths scale up for real use.

NHWC throughout; BN in inference mode (folds via algorithms/bn_fold).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides,
                    kernel_dilation=self.dilation, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        return nn.relu(x)


class DilatedResBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        y = ConvBN(self.features, (3, 3), self.strides, self.dilation)(x)
        y = nn.Conv(self.features, (3, 3), (1, 1),
                    kernel_dilation=self.dilation, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=True)(y)
        if x.shape[-1] != self.features or self.strides != (1, 1):
            x = nn.Conv(self.features, (1, 1), self.strides,
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=True)(x)
        return nn.relu(x + y)


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling: 1x1 + three dilated 3x3 branches +
    image-level pooling, concatenated and projected."""
    features: int = 64
    rates: Sequence[int] = (6, 12, 18)

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1:3]
        branches = [ConvBN(self.features, (1, 1))(x)]
        for r in self.rates:
            branches.append(ConvBN(self.features, (3, 3),
                                   dilation=(r, r))(x))
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = ConvBN(self.features, (1, 1))(gp)
        gp = jnp.broadcast_to(gp, (x.shape[0], H, W, self.features))
        branches.append(gp)
        x = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.features, (1, 1))(x)


class DeepLabV3(nn.Module):
    num_classes: int = 21
    width: int = 32
    aspp_features: int = 64
    encoder_blocks: Sequence[int] = (1, 1, 2)

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, 3) -> per-pixel logits (B, H, W, num_classes)."""
        B, H, W, _ = x.shape
        x = ConvBN(self.width, (3, 3), (2, 2))(x)          # /2
        for i, n in enumerate(self.encoder_blocks):
            stride = (2, 2) if i < 2 else (1, 1)           # output stride 8
            dilation = (2, 2) if i >= 2 else (1, 1)
            for j in range(n):
                x = DilatedResBlock(self.width * 2 ** i,
                                    stride if j == 0 else (1, 1),
                                    dilation)(x)
        x = ASPP(self.aspp_features)(x)
        x = nn.Conv(self.num_classes, (1, 1))(x)
        x = jax.image.resize(x, (B, H, W, self.num_classes), "bilinear")
        return x


DeepLabV3Tiny = partial(DeepLabV3, num_classes=8, width=8, aspp_features=16,
                        encoder_blocks=(1, 1, 1))
