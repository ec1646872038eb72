"""Sparse NOC supervision targets via direct binning.

The reference scatters per-object sparse LiDAR object-coordinate points
into dense H x W maps (pipelines/loading.py:28-50), encodes them
(NOCCoder.encode) and RoIAligns map + mask to 28x28 with mask
renormalisation (core/bbox_3d/masked_dense_target.py). Dense per-object
maps are wasteful (G x H x W x 3 mostly zeros); here the sparse (uv, oc)
lists stay sparse: each point is encoded point-wise (encode commutes with
the average) and binned directly into its RoI's 28x28 grid with
segment-sum. Bin weights are binary occupancy normalised to mean one,
matching masked_dense_target.py:18-20.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def encode_noc_points(
    oc: Array,            # (..., 3) object-frame coords
    dims: Array,          # (..., 3) broadcastable
    flip: Array,          # (...,) bool broadcastable
    means,
    stds,
    eps: float = 1e-5,
) -> Array:
    """Point-wise NOC encoding (coord_coder semantics, no mask weighting)."""
    parts = oc / jnp.clip(dims, eps, None)
    sign = jnp.where(flip[..., None], -1.0, 1.0)
    parts = parts * jnp.concatenate(
        [jnp.ones_like(parts[..., :2]), sign * jnp.ones_like(parts[..., 2:])],
        -1,
    )
    return (parts - jnp.asarray(means)) / jnp.asarray(stds)


def sparse_noc_targets(
    pos_rois: Array,       # (P, 4) xyxy (image coords)
    pos_valid: Array,      # (P,)
    pos_gt_inds: Array,    # (P,) index into the GT axis
    uv: Array,             # (G, Q, 2) sparse pixel coords per GT
    oc_enc: Array,         # (G, Q, 3) *encoded* NOC values per point
    pts_valid: Array,      # (G, Q)
    dense_size: int,
    eps: float = 1e-4,
) -> Tuple[Array, Array]:
    """Returns (targets (P, S, S, 3), weights (P, S, S, 1))."""
    P = pos_rois.shape[0]
    S = dense_size
    Q = uv.shape[1]

    roi_uv = uv[pos_gt_inds]                      # (P, Q, 2)
    roi_oc = oc_enc[pos_gt_inds]                  # (P, Q, 3)
    roi_ok = pts_valid[pos_gt_inds] & pos_valid[:, None]

    x1 = pos_rois[:, 0:1]
    y1 = pos_rois[:, 1:2]
    bw = jnp.clip((pos_rois[:, 2:3] - x1) / S, 1e-3, None)
    bh = jnp.clip((pos_rois[:, 3:4] - y1) / S, 1e-3, None)
    bx = jnp.floor((roi_uv[..., 0] - x1) / bw).astype(jnp.int32)
    by = jnp.floor((roi_uv[..., 1] - y1) / bh).astype(jnp.int32)
    inside = (bx >= 0) & (bx < S) & (by >= 0) & (by < S) & roi_ok

    roi_idx = jnp.arange(P, dtype=jnp.int32)[:, None]
    seg = roi_idx * (S * S) + by * S + bx
    seg = jnp.where(inside, seg, P * S * S)       # dump slot for invalid

    flat_seg = seg.reshape(P * Q)
    flat_oc = jnp.where(inside[..., None], roi_oc, 0.0).reshape(P * Q, 3)
    ones = inside.astype(jnp.float32).reshape(P * Q)

    sums = jax.ops.segment_sum(
        flat_oc, flat_seg, num_segments=P * S * S + 1
    )[:-1].reshape(P, S, S, 3)
    counts = jax.ops.segment_sum(
        ones, flat_seg, num_segments=P * S * S + 1
    )[:-1].reshape(P, S, S, 1)

    targets = sums / jnp.clip(counts, 1.0, None)
    weights = (counts > 0).astype(jnp.float32)
    weights = weights / jnp.clip(jnp.mean(weights), eps, None)
    return targets, weights
