"""DeltaXYWH box codec and anchor generation (mmdet-compatible semantics).

The reference binds these from mmdet (configs/kitti_multiclass.py:24-33,
50-57): encode boxes as center/size deltas normalised by target stds;
decode clamps dw/dh and optionally clips to the image.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def _xyxy_to_cxcywh(boxes: Array) -> Tuple[Array, Array, Array, Array]:
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def delta_encode(
    proposals: Array,     # (..., 4) xyxy
    gts: Array,           # (..., 4) xyxy
    means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
    stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    eps: float = 1e-6,
) -> Array:
    px, py, pw, ph = _xyxy_to_cxcywh(proposals)
    gx, gy, gw, gh = _xyxy_to_cxcywh(gts)
    pw = jnp.clip(pw, eps, None)
    ph = jnp.clip(ph, eps, None)
    d = jnp.stack(
        [
            (gx - px) / pw,
            (gy - py) / ph,
            jnp.log(jnp.clip(gw, eps, None) / pw),
            jnp.log(jnp.clip(gh, eps, None) / ph),
        ],
        -1,
    )
    return (d - jnp.asarray(means)) / jnp.asarray(stds)


def delta_decode(
    proposals: Array,     # (..., 4) xyxy
    deltas: Array,        # (..., 4)
    means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
    stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    max_shape: Tuple[int, int] | None = None,   # (H, W) clip
    wh_ratio_clip: float = 16.0 / 1000.0,
) -> Array:
    d = deltas * jnp.asarray(stds) + jnp.asarray(means)
    max_ratio = abs(math.log(wh_ratio_clip))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)
    px, py, pw, ph = _xyxy_to_cxcywh(proposals)
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    boxes = jnp.stack(
        [gx - 0.5 * gw, gy - 0.5 * gh, gx + 0.5 * gw, gy + 0.5 * gh], -1
    )
    if max_shape is not None:
        h, w = max_shape
        boxes = jnp.stack(
            [
                jnp.clip(boxes[..., 0], 0, w),
                jnp.clip(boxes[..., 1], 0, h),
                jnp.clip(boxes[..., 2], 0, w),
                jnp.clip(boxes[..., 3], 0, h),
            ],
            -1,
        )
    return boxes


def base_anchors(
    base_size: float,
    scales: Sequence[float],
    ratios: Sequence[float],
) -> Array:
    """(num_ratios * num_scales, 4) xyxy anchors centered at the origin.

    Order matches mmdet AnchorGenerator (ratio-major).
    """
    anchors = []
    for r in ratios:
        for s in scales:
            w = base_size * s * math.sqrt(1.0 / r)
            h = base_size * s * math.sqrt(r)
            anchors.append([-0.5 * w, -0.5 * h, 0.5 * w, 0.5 * h])
    return jnp.asarray(anchors)


def grid_anchors(
    feat_size: Tuple[int, int],
    stride: int,
    scales: Sequence[float],
    ratios: Sequence[float],
) -> Array:
    """All anchors for one level: (H * W * A, 4), row-major, anchor-minor."""
    base = base_anchors(float(stride), scales, ratios)      # (A, 4)
    fh, fw = feat_size
    xs = jnp.arange(fw) * stride
    ys = jnp.arange(fh) * stride
    shift = jnp.stack(
        [
            jnp.tile(xs[None, :], (fh, 1)),
            jnp.tile(ys[:, None], (1, fw)),
            jnp.tile(xs[None, :], (fh, 1)),
            jnp.tile(ys[:, None], (1, fw)),
        ],
        -1,
    ).reshape(fh * fw, 1, 4)
    return (shift + base[None]).reshape(fh * fw * len(base), 4)


def multilevel_anchors(
    feat_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    scales: Sequence[float],
    ratios: Sequence[float],
) -> List[Array]:
    return [
        grid_anchors(fs, st, scales, ratios)
        for fs, st in zip(feat_sizes, strides)
    ]
