"""Camera projection with clip-aware masking and analytic pose Jacobians.

The residual model (matching the reference solver's semantics,
``/root/reference/monorun/ops/least_squares/jacobian.py:4-45`` and the Ceres
cost ``src/pnp_uncert_cpu.cpp:24-51``):

    r_i = w_i * ( clip( pi( K (R_y(yaw) X_i + t) ) ) - x2d_i )

with z clipped to ``z >= z_min`` and the projected (u, v) clipped to the image
rectangle expanded by an allowed border. Clipped points (and RANSAC outliers)
get zero Jacobian rows, exactly as the reference zeroes them.

All functions are batched over a leading RoI axis and fixed-shape; `vmap`
over it is unnecessary — shapes are (b, n, ...) throughout.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def yaw_rotation_matrix(yaw: Array) -> Array:
    """R_y(yaw): (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


class ProjectionResult(NamedTuple):
    uv: Array            # (b, n, 2) clipped projections
    z: Array             # (b, n, 1) clipped depths
    z_clip_mask: Array   # (b, n, 1) bool, True where depth was clipped
    uv_clip_mask: Array  # (b, n, 2) bool, True where u/v was clipped
    sin_yaw: Array       # (b,)
    cos_yaw: Array       # (b,)
    error_unweighted: Array  # (b, n, 2) uv - coords_2d
    k_r: Array           # (b, 3, 3) K @ R_y


def forward_proj(
    coords_2d: Array,   # (b, n, 2)
    coords_3d: Array,   # (b, n, 3)
    cam_mats: Array,    # (b, 3, 3)
    z_min: float,
    u_range: Array,     # (b, 2)
    v_range: Array,     # (b, 2)
    yaw: Array,         # (b, 1)
    t_vec: Array,       # (b, 3)
) -> ProjectionResult:
    """Project object coords with a yaw-only pose; returns clip masks."""
    sin_yaw = jnp.sin(yaw)[:, 0]
    cos_yaw = jnp.cos(yaw)[:, 0]
    rot = yaw_rotation_matrix(yaw[:, 0])              # (b, 3, 3)
    k_r = cam_mats @ rot                              # (b, 3, 3)
    k_t = (cam_mats @ t_vec[..., None])[..., 0]       # (b, 3)

    uvz = jnp.einsum("bux,bnx->bnu", k_r, coords_3d) + k_t[:, None, :]
    uv, z = uvz[..., :2], uvz[..., 2:3]
    z_clip_mask = z < z_min
    z = jnp.maximum(z, z_min)
    uv = uv / z

    uv_lb = jnp.stack([u_range[:, 0], v_range[:, 0]], -1)[:, None, :]  # (b,1,2)
    uv_ub = jnp.stack([u_range[:, 1], v_range[:, 1]], -1)[:, None, :]
    uv_clip_mask = (uv < uv_lb) | (uv > uv_ub)
    uv = jnp.clip(uv, uv_lb, uv_ub)

    return ProjectionResult(
        uv=uv,
        z=z,
        z_clip_mask=z_clip_mask,
        uv_clip_mask=uv_clip_mask,
        sin_yaw=sin_yaw,
        cos_yaw=cos_yaw,
        error_unweighted=uv - coords_2d,
        k_r=k_r,
    )


def pose_jacobians(
    proj: ProjectionResult,
    cam_mats: Array,          # (b, 3, 3)
    coords_2d_istd: Array,    # (b, n, 2)
    coords_3d: Array,         # (b, n, 3)
    inlier_mask: Optional[Array],  # (b, n) bool or None
) -> Tuple[Array, Array, Array]:
    """Weighted Jacobians of the residual w.r.t. [yaw, t]; zero at clips.

    Returns (jac_yaw (b,n,2,1), jac_t (b,n,2,3), zero_mask (b,n,2)).
    Mirrors jacobian.py:48-98.
    """
    uv, z = proj.uv, proj.z
    zero_mask = proj.z_clip_mask | proj.uv_clip_mask
    if inlier_mask is not None:
        zero_mask = zero_mask | ~inlier_mask[..., None]

    # d r / d t : rows of K over z, minus uv-coupled z column.
    jac_t_xy = cam_mats[:, None, :2, :2] / z[..., None]           # (b,n,2,2)
    jac_t_z = (cam_mats[:, None, :2, 2:3] - uv[..., None]) / z[..., None]
    jac_t = jnp.concatenate([jac_t_xy, jac_t_z], -1)              # (b,n,2,3)
    jac_t = jac_t * coords_2d_istd[..., None]
    jac_t = jnp.where(zero_mask[..., None], 0.0, jac_t)

    # d r / d yaw : [[fx, cx], [0, cy]] @ dR/dyaw acting on [x, z].
    sin_yaw, cos_yaw = proj.sin_yaw, proj.cos_yaw
    jac_yaw_m1_l = cam_mats[:, 0:2][:, :, [0, 2]]                 # (b,2,2)
    jac_yaw_m1_r = jnp.stack(
        [
            jnp.stack([-sin_yaw, cos_yaw], -1),
            jnp.stack([-cos_yaw, -sin_yaw], -1),
        ],
        -2,
    )                                                             # (b,2,2)
    jac_yaw_m1 = jac_yaw_m1_l @ jac_yaw_m1_r                      # (b,2,2)
    jac_yaw_m2 = jnp.einsum(
        "bnu,bx->bnux", uv, jnp.stack([cos_yaw, sin_yaw], -1)
    )                                                             # (b,n,2,2)
    jac_yaw_m = jac_yaw_m1[:, None] + jac_yaw_m2
    xz = coords_3d[..., [0, 2]]                                   # (b,n,2)
    jac_yaw = jnp.einsum("bnux,bnx->bnu", jac_yaw_m, xz) / z
    jac_yaw = jac_yaw * coords_2d_istd
    jac_yaw = jnp.where(zero_mask, 0.0, jac_yaw)[..., None]       # (b,n,2,1)

    return jac_yaw, jac_t, zero_mask


def jacobian_and_error(
    coords_2d: Array,
    coords_2d_istd: Array,
    coords_3d: Array,
    cam_mats: Array,
    u_range: Array,
    v_range: Array,
    z_min: float,
    yaw: Array,
    t_vec: Array,
    inlier_mask: Optional[Array],
) -> Tuple[Array, Array]:
    """Stacked pose Jacobian (b, 2n, 4) and weighted residual (b, 2n).

    Columns ordered [yaw, tx, ty, tz] to match the reference covariance
    layout (hessian.py:44-49).
    """
    proj = forward_proj(
        coords_2d, coords_3d, cam_mats, z_min, u_range, v_range, yaw, t_vec
    )
    jac_yaw, jac_t, zero_mask = pose_jacobians(
        proj, cam_mats, coords_2d_istd, coords_3d, inlier_mask
    )
    b, n = coords_2d.shape[:2]
    jac = jnp.concatenate([jac_yaw, jac_t], -1).reshape(b, 2 * n, 4)
    error = proj.error_unweighted * coords_2d_istd
    if inlier_mask is not None:
        error = jnp.where(inlier_mask[..., None], error, 0.0)
    # Residuals at clipped points keep their (clipped) error but have zero
    # Jacobian rows, matching the reference solver's behaviour.
    return jac, error.reshape(b, 2 * n)


def gn_normal_equations(
    coords_2d: Array,
    coords_2d_istd: Array,
    coords_3d: Array,
    cam_mats: Array,
    u_range: Array,
    v_range: Array,
    z_min: float,
    yaw: Array,
    t_vec: Array,
    inlier_mask: Optional[Array],
) -> Tuple[Array, Array, Array]:
    """Fused Gauss-Newton terms: (g (4, b), h (4, 4, b), cost (b,)).

    Same math as ``jacobian_and_error`` followed by J^T e, J^T J and
    ||e||^2, but contracted column-by-column so the (b, 2n, 4) Jacobian
    is never materialized (the LM loop re-evaluates this every
    iteration), and emitted entry-major — the batch stays on the lane
    axis for ``spd_solve_packed`` instead of tile-padding (4, 4) blocks.
    """
    proj = forward_proj(
        coords_2d, coords_3d, cam_mats, z_min, u_range, v_range, yaw, t_vec
    )
    jac_yaw, jac_t, _ = pose_jacobians(
        proj, cam_mats, coords_2d_istd, coords_3d, inlier_mask
    )
    err = proj.error_unweighted * coords_2d_istd         # (b, n, 2)
    if inlier_mask is not None:
        err = jnp.where(inlier_mask[..., None], err, 0.0)
    cols = (jac_yaw[..., 0], jac_t[..., 0], jac_t[..., 1], jac_t[..., 2])

    def red(a, bb):
        return jnp.sum(a * bb, axis=(1, 2))

    g = jnp.stack([red(c, err) for c in cols])           # (4, b)
    rows = [[None] * 4 for _ in range(4)]
    for i in range(4):
        for j in range(i, 4):
            rows[i][j] = rows[j][i] = red(cols[i], cols[j])
    h = jnp.stack([jnp.stack(r) for r in rows])          # (4, 4, b)
    cost = red(err, err)
    return g, h, cost


def approx_hessian(
    coords_2d: Array,
    coords_2d_istd: Array,
    coords_3d: Array,
    cam_mats: Array,
    u_range: Array,
    v_range: Array,
    z_min: float,
    yaw: Array,
    t_vec: Array,
    inlier_mask: Optional[Array],
) -> Array:
    """Gauss-Newton J^T J, shape (b, 4, 4). Mirrors hessian.py:67-87."""
    jac, _ = jacobian_and_error(
        coords_2d, coords_2d_istd, coords_3d, cam_mats,
        u_range, v_range, z_min, yaw, t_vec, inlier_mask,
    )
    return jnp.einsum("bni,bnj->bij", jac, jac)


def exact_hessian(
    coords_2d: Array,
    coords_2d_istd: Array,
    coords_3d: Array,
    cam_mats: Array,
    u_range: Array,
    v_range: Array,
    z_min: float,
    yaw: Array,
    t_vec: Array,
    inlier_mask: Optional[Array],
) -> Array:
    """Exact LS Hessian, shape (b, 4, 4). Mirrors hessian.py:5-64.

    The reference differentiates J^T e (the analytic gradient of the
    half-squared residual objective) once more w.r.t. the 4-vector pose
    via autograd on a x4-replicated batch; here the same quantity is one
    ``jax.jacfwd`` of the analytic gradient per RoI (vmapped). Equals
    approx_hessian (Gauss-Newton J^T J) plus the second-order residual
    curvature term sum_i e_i * d2 e_i / d pose^2, which the reference
    drops by default (forward_exact_hessian=False, configs/
    kitti_multiclass.py:128)."""
    def grad_of(c2d, istd, c3d, K, ur, vr, msk, pose):
        def g(p):
            jac, err = jacobian_and_error(
                c2d[None], istd[None], c3d[None], K[None],
                ur[None], vr[None], z_min, p[None, :1], p[None, 1:],
                msk,
            )
            return jnp.einsum("bni,bn->i", jac, err)
        return jax.jacfwd(g)(pose)

    pose = jnp.concatenate([yaw, t_vec], axis=1)          # (b, 4)
    if inlier_mask is None:
        return jax.vmap(
            lambda *a: grad_of(*a[:6], None, a[6])
        )(coords_2d, coords_2d_istd, coords_3d, cam_mats,
          u_range, v_range, pose)
    return jax.vmap(
        lambda *a: grad_of(*a[:6], a[6][None], a[7])
    )(coords_2d, coords_2d_istd, coords_3d, cam_mats,
      u_range, v_range, inlier_mask, pose)


def project_points(
    coords_3d: Array,       # (n, h, w, 3) object-frame coords
    pose: Array,            # (n, 4): [tx, ty, tz, yaw]
    cam_intrinsic: Array,   # (n, 3, 3)
    img_shapes: Array,      # (n, 2) [h, w]
    z_min: float = 0.5,
    allowed_border: float = 200.0,
) -> Array:
    """Dense-map projection used by the projection head (train-time).

    Mirrors uncert_projection_head.py:35-77 but channels-last.
    Returns (n, h, w, 2) clipped pixel coordinates.
    """
    n, h, w, _ = coords_3d.shape
    rot = yaw_rotation_matrix(pose[..., 3])          # (n, 3, 3)
    proj_r = cam_intrinsic @ rot                     # (n, 3, 3)
    proj_t = (cam_intrinsic @ pose[..., :3, None])[..., 0]  # (n, 3)
    pts = coords_3d.reshape(n, h * w, 3)
    uvz = jnp.einsum("bux,bnx->bnu", proj_r, pts) + proj_t[:, None, :]
    uv = uvz[..., :2] / jnp.clip(uvz[..., 2:3], z_min, None)
    uv_max = img_shapes[:, None, [1, 0]] + allowed_border  # (n, 1, 2)
    uv = jnp.clip(uv, -allowed_border, None)
    uv = jnp.minimum(uv, uv_max)
    return uv.reshape(n, h, w, 2)
