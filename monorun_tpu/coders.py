"""Target coders: pure, jit-friendly encode/decode transforms.

Re-implements the semantics of the reference coders (see
``/root/reference/monorun/core/bbox_3d/``):

* :class:`NOCCoder`       — coord_coder/noc_coder.py
* :class:`DimCoder`       — dim_coder/multiclass_norm_dim_coder.py
* :class:`ProjErrorCoder` — proj_error_coder/distance_invar_proj_error_coder.py
* ``encode_rotation``     — rotation_coder/vec2d_rotation_coder.py

Differences from the reference: everything is a stateless function over
channels-last arrays (TPU-native ``(n, h, w, c)`` layout instead of torch
NCHW), flip is a per-RoI boolean vector (vectorised instead of a Python
bool branch), and variance propagation is expressed without in-place ops.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

Array = jnp.ndarray

# KITTI class statistics (car / pedestrian / cyclist), identical to the
# reference defaults (fc_extractor.py:27-35).
KITTI_DIM_MEANS = ((3.89, 1.53, 1.62), (0.82, 1.78, 0.63), (1.77, 1.72, 0.57))
KITTI_DIM_STDS = ((0.44, 0.14, 0.11), (0.25, 0.13, 0.12), (0.15, 0.10, 0.14))
NOC_MEANS = (-0.1, -0.5, 0.0)
NOC_STDS = (0.35, 0.23, 0.34)


@dataclasses.dataclass(frozen=True)
class NOCCoder:
    """Normalized-object-coordinate codec with variance propagation.

    ``encode``: masked object coords -> z-scored NOC parts (training target).
    ``decode``: NOC parts (+variance) -> object-frame coords (+variance),
    multiplying by per-RoI dimensions. Mirrors noc_coder.py:17-73.
    """

    target_means: Sequence[float] = NOC_MEANS
    target_stds: Sequence[float] = NOC_STDS
    eps: float = 1e-5

    def encode(
        self,
        gt_coords_3d: Array,   # (n, h, w, 3) mask-weighted coords
        gt_coords_3d_mask: Array,  # (n, h, w, 1)
        dimensions: Array,     # (n, 3) [l, h, w]
        flip: Array,           # (n,) bool
    ) -> Tuple[Array, Array]:
        means = jnp.asarray(self.target_means, gt_coords_3d.dtype)
        stds = jnp.asarray(self.target_stds, gt_coords_3d.dtype)
        foreground = gt_coords_3d_mask >= self.eps
        parts = (
            gt_coords_3d
            / jnp.clip(gt_coords_3d_mask, self.eps, None)
            / jnp.clip(dimensions, self.eps, None)[:, None, None, :]
        )
        parts_mask = jnp.where(foreground, gt_coords_3d_mask, 0.0)
        # z is negated under horizontal flip (object frame is mirrored).
        flip_sign = jnp.where(flip[:, None, None], -1.0, 1.0)
        parts = parts * jnp.stack(
            [jnp.ones_like(flip_sign), jnp.ones_like(flip_sign), flip_sign], -1
        )
        parts = (parts - means) / stds
        return parts * parts_mask, parts_mask

    def decode(
        self,
        part: Array,                 # (n, h, w, 3)
        part_var: Optional[Array],   # (n, h, w, 3) or None
        dimensions: Array,           # (n, 3)
        dimensions_var: Optional[Array],  # (n, 3) or None
        flip: Array,                 # (n,) bool — NOTE: flip handled upstream
    ) -> Tuple[Array, Optional[Array]]:
        del flip  # flip correction is resolved in the NOC head channel pairs
        means = jnp.asarray(self.target_means, part.dtype)
        stds = jnp.asarray(self.target_stds, part.dtype)
        dims = dimensions[:, None, None, :]
        part_norm = part * stds + means
        coords_3d = part_norm * dims

        coords_3d_var: Optional[Array] = None
        if part_var is not None:
            part_norm_var = part_var * jnp.square(stds)
            coords_3d_var = part_norm_var * jnp.square(dims)
            if dimensions_var is not None:
                dims_var = dimensions_var[:, None, None, :]
                coords_3d_var = (
                    coords_3d_var
                    + dims_var * jnp.square(part_norm)
                    + part_norm_var * dims_var
                )
        elif dimensions_var is not None:
            dims_var = dimensions_var[:, None, None, :]
            coords_3d_var = dims_var * jnp.square(part_norm)
        return coords_3d, coords_3d_var


@dataclasses.dataclass(frozen=True)
class DimCoder:
    """Per-class z-score codec for 3D dimensions (l, h, w).

    Mirrors multiclass_norm_dim_coder.py:5-36.
    """

    target_means: Sequence[Sequence[float]] = KITTI_DIM_MEANS
    target_stds: Sequence[Sequence[float]] = KITTI_DIM_STDS

    def encode(self, dimensions: Array, labels: Array) -> Array:
        means = jnp.asarray(self.target_means, dimensions.dtype)[labels]
        stds = jnp.asarray(self.target_stds, dimensions.dtype)[labels]
        return (dimensions - means) / stds

    def decode(
        self, dim: Array, dim_var: Optional[Array], labels: Array
    ) -> Tuple[Array, Optional[Array]]:
        means = jnp.asarray(self.target_means, dim.dtype)[labels]
        stds = jnp.asarray(self.target_stds, dim.dtype)[labels]
        dimensions = dim * stds + means
        dimensions_var = (
            dim_var * jnp.square(stds) if dim_var is not None else None
        )
        return dimensions, dimensions_var


@dataclasses.dataclass(frozen=True)
class ProjErrorCoder:
    """Distance-invariant reprojection-error codec.

    Scales pixel reprojection error by distance/(ref_length*ref_focal_y*
    target_std) so the loss is invariant to object distance, and folds MC
    epistemic coordinate variance into the aleatoric log-std at test time.
    Mirrors distance_invar_proj_error_coder.py:6-64.
    """

    ref_length: float = 1.6
    ref_focal_y: float = 722.0
    target_std: float = 0.15
    distance_min: float = 0.1
    epistemic_std_gain: float = 1.0

    @property
    def scaling_denominator(self) -> float:
        return self.ref_length * self.ref_focal_y * self.target_std

    def encode(self, coords_2d_diff_std: Array, distance: Array) -> Array:
        # coords_2d_diff_std: (n, h, w, c); distance: (n, 1)
        return coords_2d_diff_std * (
            distance[:, None, None, :] / self.scaling_denominator
        )

    def decode(self, proj_error_std: Array, distance: Array) -> Array:
        d = jnp.clip(distance[:, None, None, :], self.distance_min, None)
        return proj_error_std * (self.scaling_denominator / d)

    def decode_logstd(
        self,
        proj_logstd: Array,            # (n, h, w, 2)
        coords_3d_var: Optional[Array],  # (n, h, w, 3) or None
        distance: Optional[Array],     # (n, 1) or None
    ) -> Array:
        if distance is not None:
            d = jnp.clip(distance[:, None, None, :], self.distance_min, None)
        else:
            d = jnp.asarray(self.scaling_denominator, proj_logstd.dtype)
        if coords_3d_var is not None:
            # u-variance mixes x/z epistemic variance; v-variance takes y.
            var_u = 0.5 * (coords_3d_var[..., 0] + coords_3d_var[..., 2])
            var_v = coords_3d_var[..., 1]
            coords_2d_var = jnp.stack([var_u, var_v], axis=-1)
            coords_2d_var = (
                coords_2d_var * (self.ref_focal_y * self.epistemic_std_gain) ** 2
                + jnp.exp(2.0 * proj_logstd) * self.scaling_denominator**2
            ) / jnp.square(d)
            return 0.5 * jnp.log(coords_2d_var)
        return proj_logstd + jnp.log(self.scaling_denominator / d)

    def cov_correction(self, cov: Array, distance: Array) -> Array:
        # cov: (n, 4, 4); distance: (n,)
        scale = jnp.square(self.scaling_denominator / distance)
        return cov * scale[:, None, None]


def encode_rotation(angles: Array) -> Array:
    """yaw -> (cos, sin); mirrors vec2d_rotation_coder.py:12-18."""
    if angles.ndim == 1:
        angles = angles[:, None]
    return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)


def decode_rotation(vecs: Array) -> Array:
    """(cos, sin) -> yaw (the reference leaves this unimplemented)."""
    return jnp.arctan2(vecs[..., 1], vecs[..., 0])
