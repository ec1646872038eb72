"""Batched uncertainty-weighted PnP — all RoIs solved in parallel on-device.

Replaces the reference's sequential per-RoI host pipeline (OpenCV EPnP +
RANSAC init, Ceres Levenberg-Marquardt refine, torch J^T J covariance;
ops/least_squares/pnp_uncert_cpu.py:10-127, src/pnp_uncert_cpu.cpp:245-292,
pnp_uncert.py:7-87) with a fixed-shape, fully batched formulation:

1. **istd pre-filter** — points whose inverse-std (both channels) is below
   ``thres * mean`` are excluded (pnp_uncert_cpu.py:164-168 semantics,
   keep-all fallback when <=4 survive).
2. **Closed-form yaw-DLT init** — the pose is 4-DoF (yaw + t), so the
   projection constraints are *linear* in [cos(yaw), sin(yaw), t]:
       u-row:  c*(fx*x + (cx-u)*z) + s*(fx*z - (cx-u)*x) + fx*tx + (cx-u)*tz = 0
       v-row:  c*((cy-v)*z)        - s*((cy-v)*x) + fy*ty + (cy-v)*tz = -fy*y
   A weighted 5x5 normal solve replaces EPnP's control-point machinery and
   maps directly onto batched matmuls. (cos, sin) is then normalised and t
   re-solved linearly with yaw fixed.
3. **Vectorised RANSAC** — H hypotheses per RoI from random minimal subsets
   (keyed RNG), scored by inlier count under the per-RoI pixel threshold
   (0.2 * roi height in the reference, uncert_prop_pnp_optimizer.py:86-88);
   consensus refit on the winner's inliers.
4. **Batched Levenberg-Marquardt** — fixed-iteration damped Gauss-Newton on
   [yaw, t] using the analytic clip-aware Jacobians (ops/geometry.py),
   per-RoI adaptive damping with accept/reject, replacing Ceres.
5. **Covariance** = (J^T J)^{-1} on inliers with an eigenvalue-guarded
   fallback mirroring pnp_uncert.py:77-85.

No gradients flow through the solver (the reference wraps its forward in
torch.no_grad(), pnp_uncert.py:33); callers get stop_gradient outputs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .geometry import approx_hessian, gn_normal_equations
from .linalg_small import (
    spd_inverse, spd_inverse_packed, spd_solve_packed, spd_valid,
    spd_valid_packed,
)

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PnPConfig:
    z_min: float = 0.5
    istd_thres: float = 0.6          # epnp_istd_thres in the reference
    inlier_opt_only: bool = True
    ransac_hypotheses: int = 32      # reference: 30 cv2 iterations
    ransac_min_points: int = 4
    lm_iters: int = 8
    lm_lambda_init: float = 1e-4
    lm_lambda_up: float = 4.0
    lm_lambda_down: float = 0.25
    coord_istd_normalize: bool = False
    eps: float = 1e-6
    # use the exact LS Hessian (Gauss-Newton J^T J + second-order
    # residual curvature, reference hessian.py:5-64) for the pose
    # covariance instead of the LM carry's J^T J. The reference ships
    # this OFF (forward_exact_hessian=False, configs/
    # kitti_multiclass.py:128); provided for parity completeness
    exact_hessian: bool = False


class PnPResult(NamedTuple):
    valid: Array        # (b,) bool
    yaw: Array          # (b, 1)
    t_vec: Array        # (b, 3)
    pose_cov: Array     # (b, 4, 4)
    inlier_mask: Array  # (b, n) bool


def istd_inlier_mask(istd: Array, thres: float) -> Array:
    """(b, n, 2) -> (b, n) bool; keep-all fallback when <= 4 survive."""
    mean = jnp.mean(istd, axis=1, keepdims=True)
    ok = jnp.all(istd >= thres * mean, axis=2)
    count = jnp.sum(ok, axis=1, keepdims=True)
    return jnp.where(count > 4, ok, True)


def _dlt_rows(
    coords_2d: Array, coords_3d: Array, cam_mats: Array
) -> Tuple[Array, Array]:
    """Linear system rows: A (b, 2n, 5) and constant b-vec (b, 2n)."""
    u = coords_2d[..., 0]
    v = coords_2d[..., 1]
    x, y, z = coords_3d[..., 0], coords_3d[..., 1], coords_3d[..., 2]
    fx = cam_mats[:, 0, 0][:, None]
    fy = cam_mats[:, 1, 1][:, None]
    cx = cam_mats[:, 0, 2][:, None]
    cy = cam_mats[:, 1, 2][:, None]
    zeros = jnp.zeros_like(x)
    du = cx - u
    dv = cy - v
    row_u = jnp.stack(
        [fx * x + du * z, fx * z - du * x, fx + zeros, zeros, du], -1
    )
    row_v = jnp.stack([dv * z, -dv * x, zeros, fy + zeros, dv], -1)
    b_u = zeros
    b_v = fy * y
    A = jnp.concatenate([row_u, row_v], axis=1)      # (b, 2n, 5)
    bb = jnp.concatenate([b_u, b_v], axis=1)         # (b, 2n)
    return A, bb


# upper-triangle enumeration of the 5x5 normal matrix; moment vector
# layout = [A_i*A_j for (i, j) in _TRI5] + [A_i*b for i in range(5)]
_TRI5 = [(i, j) for i in range(5) for j in range(i, 5)]
_TRI5_POS = {ij: k for k, ij in enumerate(_TRI5)}
N_MOMENTS = len(_TRI5) + 5          # 20


def dlt_point_moments(
    coords_2d: Array,     # (b, n, 2)
    coords_3d: Array,     # (b, n, 3)
    cam_mats: Array,      # (b, 3, 3)
) -> Array:
    """Per-point normal-equation moments (b, n, 20).

    The weighted 5x5 DLT system is linear in per-point outer products:
    ata[i, j] = sum_p w_p * M_p[tri(i, j)], atb[i] = sum_p w_p * M_p[15+i]
    (u-row and v-row of each point pre-summed; the u-row's constant is 0).
    Any weighting — RANSAC minimal subsets, inlier masks, istd weights —
    is then ONE contraction over points instead of gathers plus a rebuild
    of the row tensor per subset (the (b, H*k) index gathers alone
    profiled 2.4 ms/step at 800 RoIs x 32 hypotheses).
    """
    A, bb = _dlt_rows(coords_2d, coords_3d, cam_mats)   # (b, 2n, 5), (b, 2n)
    n = coords_2d.shape[1]
    Au, Av = A[:, :n], A[:, n:]
    bv = bb[:, n:]
    prods = [
        Au[..., i] * Au[..., j] + Av[..., i] * Av[..., j]
        for (i, j) in _TRI5
    ]
    atbs = [Av[..., i] * bv for i in range(5)]          # u-row b is 0
    M = jnp.stack(prods + atbs, axis=-1)
    # a degenerate point whose products overflow f32 (unbounded NOC
    # regressions early in training) must not poison the weighted
    # contraction: inf * 0-weight = NaN for EVERY subset of its RoI.
    # Dropping the point matches the information content of the old
    # per-subset gather path (which produced garbage for exactly the
    # subsets that selected it).
    return jnp.where(jnp.isfinite(M), M, 0.0)


def dlt_solve_moments(M: Array, eps: float = 1e-8) -> Tuple[Array, Array]:
    """Closed-form 4-DoF PnP from summed moments (batch, 20).

    Returns (yaw (batch, 1), t (batch, 3)). The t re-solve at the
    normalised yaw reuses the same moments: with cs = [cos, sin],
    atb_t[i] = -(c * ata[0, i] + s * ata[1, i] + atb[i]).
    """
    def tri(i, j):
        return M[..., _TRI5_POS[(min(i, j), max(i, j))]]

    def atb(i):
        return M[..., len(_TRI5) + i]

    ata = jnp.stack(
        [jnp.stack([tri(i, j) for j in range(5)], 0) for i in range(5)], 0
    )                                                   # (5, 5, batch)
    # relative Tikhonov: degenerate RoIs (e.g. zero-size padded boxes
    # whose points coincide) must stay finite
    tr = sum(ata[i, i] for i in range(5))
    ata = ata + (1e-6 * tr / 5.0 + eps) * jnp.eye(5)[:, :, None]
    atb5 = jnp.stack([atb(i) for i in range(5)], 0)     # (5, batch)
    sol = spd_solve_packed(ata, -atb5)                  # (batch, 5)
    c, s = sol[..., 0], sol[..., 1]
    norm = jnp.sqrt(jnp.clip(c * c + s * s, eps, None))
    c, s = c / norm, s / norm
    yaw = jnp.arctan2(s, c)[..., None]

    ata_t = jnp.stack(
        [jnp.stack([tri(i, j) for j in range(2, 5)], 0) for i in range(2, 5)],
        0,
    )                                                   # (3, 3, batch)
    tr_t = sum(ata_t[i, i] for i in range(3))
    ata_t = ata_t + (1e-6 * tr_t / 3.0 + eps) * jnp.eye(3)[:, :, None]
    atb_t = jnp.stack(
        [-(c * tri(0, i) + s * tri(1, i) + atb(i)) for i in range(2, 5)], 0
    )                                                   # (3, batch)
    t = spd_solve_packed(ata_t, atb_t)
    return yaw, t


def dlt_yaw_pnp(
    coords_2d: Array,     # (b, n, 2)
    weights: Array,       # (b, n) combined istd/validity weight
    coords_3d: Array,     # (b, n, 3)
    cam_mats: Array,      # (b, 3, 3)
    eps: float = 1e-8,
) -> Tuple[Array, Array]:
    """Weighted closed-form 4-DoF PnP. Returns (yaw (b, 1), t (b, 3))."""
    M = jnp.einsum(
        "bnd,bn->bd", dlt_point_moments(coords_2d, coords_3d, cam_mats),
        weights,
    )
    return dlt_solve_moments(M, eps)


def _reproj_errors(
    coords_2d: Array, coords_3d: Array, cam_mats: Array,
    yaw: Array, t: Array, z_min: float,
) -> Array:
    """Unclipped L2 pixel reprojection error (b, n) (cv2 RANSAC metric)."""
    from .geometry import yaw_rotation_matrix

    rot = yaw_rotation_matrix(yaw[:, 0])
    cam = jnp.einsum("bij,bnj->bni", rot, coords_3d) + t[:, None, :]
    z = jnp.clip(cam[..., 2:3], z_min, None)
    uv = jnp.einsum("bij,bnj->bni", cam_mats[:, :2, :2], cam[..., :2] / z) \
        + cam_mats[:, None, :2, 2]
    return jnp.linalg.norm(uv - coords_2d, axis=-1)


def ransac_yaw_pnp(
    rng: Array,
    coords_2d: Array,     # (b, n, 2)
    istd: Array,          # (b, n, 2)
    valid: Array,         # (b, n) istd pre-filter mask
    coords_3d: Array,     # (b, n, 3)
    cam_mats: Array,      # (b, 3, 3)
    thr: Array,           # (b,) pixel threshold
    cfg: PnPConfig,
) -> Tuple[Array, Array, Array]:
    """Vectorised fixed-shape RANSAC. Returns (yaw, t, inlier_mask)."""
    b, n = valid.shape
    H = cfg.ransac_hypotheses
    k = cfg.ransac_min_points
    w_point = jnp.mean(istd, axis=-1) * valid

    # sample k valid indices per hypothesis: random keys, invalid pushed
    # last, one argmin per contiguous segment of n/k points. A top_k over
    # n keys costs a full sort (4.3 ms at inference scale vs ~0 for the
    # segmented argmin), and since the points are the RoI's 28x28 grid in
    # row-major order, one-point-per-band sampling also spreads every
    # minimal set vertically across the object — better-conditioned
    # hypotheses than unconstrained uniform draws.
    assert n % k == 0, (n, k)
    keys = jax.random.uniform(rng, (b, H, n)) + jnp.where(valid, 0.0, 10.0)[:, None, :]
    seg = n // k
    segmin = jnp.argmin(keys.reshape(b, H, k, seg), axis=-1)   # (b, H, k)

    # subset selection as a 0/1-weight contraction over the shared
    # per-point moments: no index gathers (2.4 ms/step at b=800, H=32)
    # and no per-subset rebuild of the DLT row tensor
    onehot = (
        jnp.arange(seg, dtype=segmin.dtype)[None, None, None]
        == segmin[..., None]
    )                                                  # (b, H, k, seg)
    mask_w = onehot.reshape(b, H, n).astype(jnp.float32) * w_point[:, None]
    M_pt = dlt_point_moments(coords_2d, coords_3d, cam_mats)   # (b, n, 20)
    Mh = jnp.einsum("bhn,bnd->bhd", mask_w, M_pt)
    yaw_h, t_h = dlt_solve_moments(Mh.reshape(b * H, N_MOMENTS))

    # hypothesis scoring: broadcast poses against the shared point set
    # instead of repeating the (b, n, d) inputs H times
    from .geometry import yaw_rotation_matrix

    rot_h = yaw_rotation_matrix(yaw_h.reshape(b, H))          # (b, H, 3, 3)
    cam_pts = (
        jnp.einsum("bhij,bnj->bhni", rot_h, coords_3d)
        + t_h.reshape(b, H, 1, 3)
    )
    z = jnp.clip(cam_pts[..., 2:3], cfg.z_min, None)
    uv_h = jnp.einsum(
        "bij,bhnj->bhni", cam_mats[:, :2, :2], cam_pts[..., :2] / z
    ) + cam_mats[:, None, None, :2, 2]
    err = jnp.linalg.norm(uv_h - coords_2d[:, None], axis=-1)  # (b, H, n)
    inl = (err <= thr[:, None, None]) & valid[:, None, :]
    score = jnp.sum(inl, axis=-1)                     # (b, H)
    # reject hypotheses whose solution placed the object behind the camera
    score = jnp.where(t_h.reshape(b, H, 3)[..., 2] > cfg.z_min, score, -1)
    best = jnp.argmax(score, axis=1)                  # (b,)

    best_inl = jnp.take_along_axis(inl, best[:, None, None], axis=1)[:, 0]
    count = jnp.sum(best_inl, axis=1, keepdims=True)
    # cv2 keeps the RANSAC consensus only when > 4 inliers survive
    inlier_mask = jnp.where(count > 4, best_inl, valid)

    # consensus refit reuses the shared per-point moments
    M0 = jnp.einsum("bnd,bn->bd", M_pt, jnp.mean(istd, -1) * inlier_mask)
    yaw0, t0 = dlt_solve_moments(M0)
    return yaw0, t0, inlier_mask


def lm_refine(
    coords_2d: Array,
    istd: Array,
    coords_3d: Array,
    cam_mats: Array,
    u_range: Array,
    v_range: Array,
    yaw0: Array,
    t0: Array,
    inlier_mask: Optional[Array],
    cfg: PnPConfig,
) -> Tuple[Array, Array, Array]:
    """Batched damped Gauss-Newton on [yaw, t]; all RoIs in lockstep.

    One Jacobian+error evaluation per iteration: the gradient/Hessian of
    the last *accepted* pose are carried in the loop state, so a trial
    point costs a single pass over the n points (the cost used for
    accept/reject is ||err||^2 from the same evaluation). Identical
    trajectory to the classic two-pass LM, at half the per-iteration work.

    Returns (yaw (b, 1), t (b, 3), final_cost (b,)).
    """
    b = coords_2d.shape[0]

    def eval_ghc(pose):
        """Fused (gradient (4,b), J^T J (4,4,b), cost (b,)) at pose.

        Entry-major throughout: the Jacobian is contracted on the fly
        (gn_normal_equations) and the damped solve runs the unrolled
        Cholesky on (b,)-vectors riding the lane axis.
        """
        return gn_normal_equations(
            coords_2d, istd, coords_3d, cam_mats, u_range, v_range,
            cfg.z_min, pose[:, :1], pose[:, 1:], inlier_mask,
        )

    pose0 = jnp.concatenate([yaw0, t0], axis=1)       # (b, 4)
    lam0 = jnp.full((b,), cfg.lm_lambda_init)
    g0, h0, c0 = eval_ghc(pose0)
    eye = jnp.eye(4)[:, :, None]

    def body(_, state):
        pose, g, h, lam, cost = state
        d = h[jnp.arange(4), jnp.arange(4)]           # (4, b)
        # Marquardt scaling: damp by lam * diag(J^T J)
        damped = h + eye * (lam[None] * jnp.clip(d, 1e-8, None))
        delta = spd_solve_packed(damped, -g)          # (b, 4)
        pose_new = pose + delta
        g_new, h_new, cost_new = eval_ghc(pose_new)
        accept = (cost_new < cost) & jnp.isfinite(cost_new)
        pose = jnp.where(accept[:, None], pose_new, pose)
        g = jnp.where(accept[None], g_new, g)
        h = jnp.where(accept[None, None], h_new, h)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, lam * cfg.lm_lambda_down, lam * cfg.lm_lambda_up)
        lam = jnp.clip(lam, 1e-10, 1e8)
        return pose, g, h, lam, cost

    pose, _, h, _, cost = jax.lax.fori_loop(
        0, cfg.lm_iters, body, (pose0, g0, h0, lam0, c0)
    )
    # h is J^T J at the last accepted pose == the returned pose, under the
    # same mask — callers reuse it as the covariance Hessian for free
    # (entry-major (4, 4, b), ready for the packed PD check / inverse)
    return pose[:, :1], pose[:, 1:], cost, h


def pose_covariance(
    coords_2d: Array,
    istd: Array,
    coords_3d: Array,
    cam_mats: Array,
    u_range: Array,
    v_range: Array,
    yaw: Array,
    t: Array,
    inlier_mask: Optional[Array],
    z_min: float,
) -> Tuple[Array, Array]:
    """cov = (J^T J)^{-1} with eigenvalue guard (pnp_uncert.py:77-85).

    Returns (pose_cov (b, 4, 4), cov_valid (b,)).
    """
    h = approx_hessian(
        coords_2d, istd, coords_3d, cam_mats, u_range, v_range,
        z_min, yaw, t, inlier_mask,
    )
    # positive-definiteness check via Cholesky pivots replaces the
    # reference's eigenvalue guard; same degenerate cases are caught
    valid = spd_valid(h, rel=1e-9)
    h_safe = jnp.where(valid[:, None, None], h, jnp.eye(4))
    cov = spd_inverse(h_safe)
    return cov, valid


def pnp_uncert(
    coords_2d: Array,       # (b, n, 2)
    coords_2d_istd: Array,  # (b, n, 2)
    coords_3d: Array,       # (b, n, 3)
    cam_mats: Array,        # (b, 3, 3)
    u_range: Array,         # (b, 2)
    v_range: Array,         # (b, 2)
    ransac_thr: Optional[Array] = None,   # (b,) or None
    rng: Optional[Array] = None,
    cfg: PnPConfig = PnPConfig(),
) -> PnPResult:
    """Full uncertainty PnP: pre-filter -> init -> LM -> covariance.

    Fixed-shape, jit-safe, differentiable nowhere (outputs are
    stop_gradient'ed to mirror the reference's no_grad forward).
    """
    istd = coords_2d_istd
    if cfg.coord_istd_normalize:
        mean = jnp.mean(istd, axis=(1, 2), keepdims=True)
        istd = istd / jnp.clip(mean, cfg.eps, None)

    valid0 = istd_inlier_mask(istd, cfg.istd_thres)

    if ransac_thr is not None:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        yaw0, t0, inlier = ransac_yaw_pnp(
            rng, coords_2d, istd, valid0, coords_3d, cam_mats,
            ransac_thr, cfg,
        )
    else:
        yaw0, t0 = dlt_yaw_pnp(
            coords_2d, jnp.mean(istd, -1) * valid0, coords_3d, cam_mats
        )
        inlier = valid0

    opt_mask = inlier if cfg.inlier_opt_only else None
    yaw, t, cost, hess = lm_refine(
        coords_2d, istd, coords_3d, cam_mats, u_range, v_range,
        yaw0, t0, opt_mask, cfg,
    )
    # cov = H^{-1} with PD guard (pnp_uncert.py:77-85); the default
    # Hessian comes straight out of the LM carry (J^T J at the final
    # pose, entry-major so the guard+inverse stays on the lane axis);
    # cfg.exact_hessian swaps in the full second-order Hessian
    if cfg.exact_hessian:
        from .geometry import exact_hessian as _eh

        hess = jnp.transpose(
            _eh(
                coords_2d, istd, coords_3d, cam_mats, u_range, v_range,
                cfg.z_min, yaw, t, opt_mask,
            ),
            (1, 2, 0),
        )
    cov_valid = spd_valid_packed(hess, rel=1e-9)
    h_safe = jnp.where(cov_valid[None, None], hess, jnp.eye(4)[:, :, None])
    cov = spd_inverse_packed(h_safe)
    valid = (
        cov_valid
        & jnp.isfinite(cost)
        & jnp.all(jnp.isfinite(yaw), axis=1)
        & jnp.all(jnp.isfinite(t), axis=1)
        & (jnp.sum(inlier, axis=1) >= cfg.ransac_min_points)
    )
    # sanitize failed slots at the source: a NaN yaw/t/cov primal poisons
    # the GRADIENTS of any masked downstream loss (zero cotangent times a
    # NaN partial is still NaN — e.g. loss_calib's d/d inv_cov term is
    # weight * diff diff^T), even though the loss VALUE is masked to 0.
    # The reference never hits this: its dynamic shapes drop failed RoIs
    # (pnp_uncert.py:77-85 invalidates, callers index by validity).
    yaw = jnp.where(valid[:, None], yaw, 0.0)
    t = jnp.where(
        valid[:, None], t, jnp.asarray([0.0, 0.0, 10.0], t.dtype)
    )
    cov = jnp.where(valid[:, None, None], cov, jnp.eye(4, dtype=cov.dtype))
    sg = jax.lax.stop_gradient
    return PnPResult(
        valid=sg(valid), yaw=sg(yaw), t_vec=sg(t),
        pose_cov=sg(cov), inlier_mask=sg(inlier),
    )
