"""SSD-lite style single-shot object detector — covers the reference's ADAS
object-detection headline (reference README.md:133-151: AdaRound W8A8 mAP
81.21% vs FP32 82.20%, nearest-round baseline 49.85%).

The reference publishes only the accuracy table for this config (the ADAS
model itself is proprietary); this is an architecturally representative
stand-in: a depthwise-separable backbone (MobileNet-style, the usual ADAS
deployment backbone) with two detection scales, each carrying a class head
and a box-regression head.  Every layer is quantsim-interceptable (conv /
depthwise conv / BN / ReLU6), so the AdaRound W8A8 recipe from the
reference's table runs end-to-end on it (see tests/test_model_zoo_extra.py).

TPU notes: all convs are NHWC with static shapes; the two scale outputs are
flattened and concatenated so the whole forward is one fused XLA program
(no per-anchor Python loops).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class _ConvBNRelu6(nn.Module):
    out_ch: int
    strides: Tuple[int, int] = (1, 1)
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        groups = x.shape[-1] if self.depthwise else 1
        ch = x.shape[-1] if self.depthwise else self.out_ch
        x = nn.Conv(ch, (3, 3), self.strides, padding="SAME",
                    feature_group_count=groups, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        return jnp.minimum(nn.relu(x), 6.0)


class _SeparableBlock(nn.Module):
    out_ch: int
    strides: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        x = _ConvBNRelu6(x.shape[-1], self.strides, depthwise=True)(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        return jnp.minimum(nn.relu(x), 6.0)


class SSDLite(nn.Module):
    """Two-scale SSD-lite detector.

    ``__call__(images)`` with images (B, H, W, 3) returns
    ``(cls_logits (B, A, num_classes), box_deltas (B, A, 4))`` where A is
    the total anchor count over both feature scales
    (``anchors_per_cell * (H/16 * W/16 + H/32 * W/32)``).
    """
    num_classes: int = 4
    anchors_per_cell: int = 3
    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = _ConvBNRelu6(w, (2, 2))(x)                 # /2
        x = _SeparableBlock(w * 2, (2, 2))(x)          # /4
        x = _SeparableBlock(w * 4, (2, 2))(x)          # /8
        f16 = _SeparableBlock(w * 4, (2, 2))(x)        # /16 — scale 1
        f32 = _SeparableBlock(w * 8, (2, 2))(f16)      # /32 — scale 2

        cls_out, box_out = [], []
        for feat in (f16, f32):
            a = self.anchors_per_cell
            cls = nn.Conv(a * self.num_classes, (3, 3), padding="SAME")(feat)
            box = nn.Conv(a * 4, (3, 3), padding="SAME")(feat)
            b = feat.shape[0]
            cls_out.append(cls.reshape(b, -1, self.num_classes))
            box_out.append(box.reshape(b, -1, 4))
        return (jnp.concatenate(cls_out, axis=1),
                jnp.concatenate(box_out, axis=1))


def make_anchors(image_size: int, anchors_per_cell: int = 3,
                 scales: Sequence[int] = (16, 32)) -> np.ndarray:
    """Anchor centers/sizes matching SSDLite's two feature scales:
    (A, 4) array of (cy, cx, h, w) in [0, 1] image coordinates.

    The backbone's SAME-padded strided convs produce ceil-divided feature
    maps; the floor division below only matches them when ``image_size`` is
    a multiple of every stride, so reject sizes that would silently
    mismatch the heads' anchor dimension."""
    for stride in scales:
        if image_size % stride:
            raise ValueError(
                f"image_size={image_size} must be divisible by stride "
                f"{stride} (SAME-padded conv grids ceil-divide; anchors "
                f"floor-divide)")
    out = []
    for stride in scales:
        g = image_size // stride
        cy, cx = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
        cy = (cy.reshape(-1) + 0.5) / g
        cx = (cx.reshape(-1) + 0.5) / g
        for i in range(anchors_per_cell):
            size = (stride / image_size) * (1.0 + 0.5 * i)
            a = np.stack([cy, cx, np.full_like(cy, size),
                          np.full_like(cx, size)], axis=-1)
            out.append(a)
    # group per-scale anchors in the same cell-major order the heads emit
    per_scale = []
    idx = 0
    for stride in scales:
        g = image_size // stride
        cells = g * g
        block = np.stack(out[idx:idx + anchors_per_cell], axis=1)  # (cells, a, 4)
        per_scale.append(block.reshape(cells * anchors_per_cell, 4))
        idx += anchors_per_cell
    return np.concatenate(per_scale, axis=0)


def decode_boxes(box_deltas: jnp.ndarray, anchors: np.ndarray) -> jnp.ndarray:
    """Standard SSD box decode: deltas (B, A, 4) x anchors (A, 4 cy,cx,h,w)
    -> corner boxes (B, A, 4 y0,x0,y1,x1)."""
    anc = jnp.asarray(anchors, box_deltas.dtype)
    cy = anc[:, 0] + box_deltas[..., 0] * anc[:, 2]
    cx = anc[:, 1] + box_deltas[..., 1] * anc[:, 3]
    h = anc[:, 2] * jnp.exp(jnp.clip(box_deltas[..., 2], -4.0, 4.0))
    w = anc[:, 3] * jnp.exp(jnp.clip(box_deltas[..., 3], -4.0, 4.0))
    return jnp.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1)
