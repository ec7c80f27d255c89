"""MobileNet-v2 (flax linen) — the reference's headline DFQ model
(README.md:115-118: INT8 top-1 71.08% vs FP32 71.72%)."""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    out_ch: int
    strides: Tuple[int, int]
    expand_ratio: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_residual = self.strides == (1, 1) and in_ch == self.out_ch
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False)(y)
            y = nn.BatchNorm(use_running_average=True)(y)
            y = jnp.minimum(nn.relu(y), 6.0)  # ReLU6
        y = nn.Conv(hidden, (3, 3), self.strides, padding="SAME",
                    feature_group_count=hidden, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=True)(y)
        y = jnp.minimum(nn.relu(y), 6.0)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=True)(y)
        if use_residual:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x):
        # t (expand), c (channels), n (repeats), s (stride)
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        in_ch = _make_divisible(32 * self.width_mult)
        x = nn.Conv(in_ch, (3, 3), (2, 2), padding="SAME", use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = jnp.minimum(nn.relu(x), 6.0)
        for t, c, n, s in cfg:
            out_ch = _make_divisible(c * self.width_mult)
            for i in range(n):
                strides = (s, s) if i == 0 else (1, 1)
                x = InvertedResidual(out_ch, strides, t)(x)
        last = _make_divisible(1280 * max(1.0, self.width_mult))
        x = nn.Conv(last, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        x = jnp.minimum(nn.relu(x), 6.0)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes)(x)
        return x
