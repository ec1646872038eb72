import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.ops.geometry import (
    approx_hessian,
    forward_proj,
    jacobian_and_error,
    project_points,
    yaw_rotation_matrix,
)


def _random_problem(seed=0, b=3, n=24, clip_some=False):
    rng = np.random.default_rng(seed)
    fx, fy = 720.0, 720.0
    cx, cy = 620.0, 180.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    cam_mats = np.tile(K, (b, 1, 1))
    yaw_true = rng.uniform(-np.pi, np.pi, (b, 1)).astype(np.float32)
    t_true = np.stack(
        [
            rng.uniform(-5, 5, b),
            rng.uniform(-1, 1, b),
            rng.uniform(8, 40, b),
        ],
        -1,
    ).astype(np.float32)
    pts = rng.uniform(-1.5, 1.5, (b, n, 3)).astype(np.float32)
    # true projection
    uv_list = []
    for i in range(b):
        R = np.asarray(yaw_rotation_matrix(jnp.asarray(yaw_true[i, 0])))
        cam = (pts[i] @ R.T) + t_true[i]
        uv = (cam @ K.T)
        uv_list.append(uv[:, :2] / uv[:, 2:3])
    coords_2d = np.stack(uv_list).astype(np.float32)
    istd = rng.uniform(0.5, 2.0, (b, n, 2)).astype(np.float32)
    if clip_some:
        u_range = np.tile(np.array([200.0, 900.0], np.float32), (b, 1))
        v_range = np.tile(np.array([100.0, 300.0], np.float32), (b, 1))
    else:
        u_range = np.tile(np.array([-200.0, 1500.0], np.float32), (b, 1))
        v_range = np.tile(np.array([-200.0, 600.0], np.float32), (b, 1))
    return dict(
        coords_2d=coords_2d, istd=istd, pts=pts, cam_mats=cam_mats,
        u_range=u_range, v_range=v_range, yaw=yaw_true, t=t_true,
    )


def test_projection_zero_error_at_truth():
    p = _random_problem()
    proj = forward_proj(
        jnp.asarray(p["coords_2d"]), jnp.asarray(p["pts"]),
        jnp.asarray(p["cam_mats"]), 0.5,
        jnp.asarray(p["u_range"]), jnp.asarray(p["v_range"]),
        jnp.asarray(p["yaw"]), jnp.asarray(p["t"]),
    )
    np.testing.assert_allclose(
        np.asarray(proj.error_unweighted), 0.0, atol=2e-3
    )
    assert not np.asarray(proj.z_clip_mask).any()


def test_analytic_jacobian_matches_autodiff():
    p = _random_problem(seed=3, b=2, n=10)
    yaw0 = p["yaw"] + 0.1
    t0 = p["t"] + np.array([0.2, -0.1, 0.5], np.float32)

    def residual(pose_flat):
        yaw = pose_flat[:, :1]
        t = pose_flat[:, 1:]
        proj = forward_proj(
            jnp.asarray(p["coords_2d"]), jnp.asarray(p["pts"]),
            jnp.asarray(p["cam_mats"]), 0.5,
            jnp.asarray(p["u_range"]), jnp.asarray(p["v_range"]), yaw, t,
        )
        err = proj.error_unweighted * jnp.asarray(p["istd"])
        return err.reshape(err.shape[0], -1)  # (b, 2n)

    pose0 = jnp.asarray(np.concatenate([yaw0, t0], -1))
    # autodiff jacobian: (b, 2n, b, 4) -> take diagonal over batch
    jac_auto = jax.jacobian(residual)(pose0)
    b, n2 = jac_auto.shape[0], jac_auto.shape[1]
    jac_auto = np.asarray(jac_auto)[np.arange(b), :, np.arange(b), :]

    jac_analytic, err = jacobian_and_error(
        jnp.asarray(p["coords_2d"]), jnp.asarray(p["istd"]),
        jnp.asarray(p["pts"]), jnp.asarray(p["cam_mats"]),
        jnp.asarray(p["u_range"]), jnp.asarray(p["v_range"]), 0.5,
        jnp.asarray(yaw0), jnp.asarray(t0), None,
    )
    np.testing.assert_allclose(
        np.asarray(jac_analytic), jac_auto, rtol=1e-3, atol=1e-3
    )


def test_clipped_points_get_zero_jacobian_rows():
    p = _random_problem(seed=4, b=2, n=16, clip_some=True)
    jac, _ = jacobian_and_error(
        jnp.asarray(p["coords_2d"]), jnp.asarray(p["istd"]),
        jnp.asarray(p["pts"]), jnp.asarray(p["cam_mats"]),
        jnp.asarray(p["u_range"]), jnp.asarray(p["v_range"]), 0.5,
        jnp.asarray(p["yaw"]), jnp.asarray(p["t"]), None,
    )
    proj = forward_proj(
        jnp.asarray(p["coords_2d"]), jnp.asarray(p["pts"]),
        jnp.asarray(p["cam_mats"]), 0.5,
        jnp.asarray(p["u_range"]), jnp.asarray(p["v_range"]),
        jnp.asarray(p["yaw"]), jnp.asarray(p["t"]),
    )
    clip = np.asarray(proj.uv_clip_mask | proj.z_clip_mask)
    assert clip.any(), "fixture should clip some points"
    jac = np.asarray(jac).reshape(2, -1, 2, 4)
    assert np.all(jac[clip] == 0.0)


def test_outlier_mask_zeroes_jacobian():
    p = _random_problem(seed=5, b=1, n=8)
    inlier = np.ones((1, 8), bool)
    inlier[0, :3] = False
    jac, err = jacobian_and_error(
        jnp.asarray(p["coords_2d"]), jnp.asarray(p["istd"]),
        jnp.asarray(p["pts"]), jnp.asarray(p["cam_mats"]),
        jnp.asarray(p["u_range"]), jnp.asarray(p["v_range"]), 0.5,
        jnp.asarray(p["yaw"]), jnp.asarray(p["t"]), jnp.asarray(inlier),
    )
    jac = np.asarray(jac).reshape(1, 8, 2, 4)
    err = np.asarray(err).reshape(1, 8, 2)
    assert np.all(jac[0, :3] == 0.0)
    assert np.all(err[0, :3] == 0.0)
    assert np.any(jac[0, 3:] != 0.0)


def test_hessian_is_jtj():
    p = _random_problem(seed=6, b=2, n=12)
    h = approx_hessian(
        jnp.asarray(p["coords_2d"]), jnp.asarray(p["istd"]),
        jnp.asarray(p["pts"]), jnp.asarray(p["cam_mats"]),
        jnp.asarray(p["u_range"]), jnp.asarray(p["v_range"]), 0.5,
        jnp.asarray(p["yaw"]), jnp.asarray(p["t"]), None,
    )
    jac, _ = jacobian_and_error(
        jnp.asarray(p["coords_2d"]), jnp.asarray(p["istd"]),
        jnp.asarray(p["pts"]), jnp.asarray(p["cam_mats"]),
        jnp.asarray(p["u_range"]), jnp.asarray(p["v_range"]), 0.5,
        jnp.asarray(p["yaw"]), jnp.asarray(p["t"]), None,
    )
    jac = np.asarray(jac)
    href = np.einsum("bni,bnj->bij", jac, jac)
    np.testing.assert_allclose(np.asarray(h), href, rtol=1e-4, atol=1e-4)
    # symmetric PSD
    w = np.linalg.eigvalsh(np.asarray(h))
    assert (w >= -1e-3).all()


def test_project_points_dense():
    rng = np.random.default_rng(7)
    n, h, w = 2, 4, 4
    coords = rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32)
    pose = np.concatenate(
        [rng.uniform(-2, 2, (n, 2)), rng.uniform(10, 30, (n, 1)),
         rng.uniform(-3, 3, (n, 1))], -1,
    ).astype(np.float32)
    K = np.array([[700.0, 0, 600], [0, 700, 200], [0, 0, 1]], np.float32)
    Ks = np.tile(K, (n, 1, 1))
    shapes = np.tile(np.array([370.0, 1220.0], np.float32), (n, 1))
    uv = np.asarray(project_points(
        jnp.asarray(coords), jnp.asarray(pose), jnp.asarray(Ks),
        jnp.asarray(shapes),
    ))
    assert uv.shape == (n, h, w, 2)
    # manual check one point
    i, y, x = 0, 1, 2
    yaw = pose[0, 3]
    R = np.array(
        [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
         [-np.sin(yaw), 0, np.cos(yaw)]]
    )
    cam = R @ coords[i, y, x] + pose[0, :3]
    expect = (K @ cam)[:2] / max(cam[2], 0.5)
    expect = np.clip(expect, -200, [1220 + 200, 370 + 200])
    np.testing.assert_allclose(uv[i, y, x], expect, rtol=1e-3)


def test_exact_hessian_matches_finite_differences():
    """exact_hessian (reference hessian.py:5-64: autograd of J^T e wrt
    the pose) must match central finite differences of the analytic
    gradient and reduce to approx_hessian + curvature term."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monorun_tpu.ops.geometry import (
        approx_hessian,
        exact_hessian,
        jacobian_and_error,
    )

    rng = np.random.default_rng(3)
    b, n = 3, 24
    X = rng.normal(0, 1, (b, n, 3)).astype(np.float32)
    yaw = rng.uniform(-1, 1, (b, 1)).astype(np.float32)
    t = np.stack([rng.uniform(-1, 1, b), rng.uniform(-0.5, 0.5, b),
                  rng.uniform(6, 9, b)], 1).astype(np.float32)
    K = np.tile(np.asarray(
        [[700.0, 0, 600], [0, 700.0, 180], [0, 0, 1]], np.float32),
        (b, 1, 1))
    # observations = projections + noise (so residuals are nonzero and
    # the second-order term is exercised)
    c, s = np.cos(yaw[:, 0]), np.sin(yaw[:, 0])
    R = np.stack([np.stack([c, 0 * c, s], -1),
                  np.stack([0 * c, 1 + 0 * c, 0 * c], -1),
                  np.stack([-s, 0 * c, c], -1)], 1)
    Xc = np.einsum("bij,bnj->bni", R, X) + t[:, None]
    uv = np.einsum("bij,bnj->bni", K, Xc)
    uv = uv[..., :2] / uv[..., 2:3]
    uv = (uv + rng.normal(0, 2.0, uv.shape)).astype(np.float32)
    istd = rng.uniform(0.5, 2.0, (b, n, 2)).astype(np.float32)
    ur = np.tile(np.asarray([[-200.0, 1440.0]], np.float32), (b, 1))
    vr = np.tile(np.asarray([[-200.0, 580.0]], np.float32), (b, 1))

    args = (jnp.asarray(uv), jnp.asarray(istd), jnp.asarray(X),
            jnp.asarray(K), jnp.asarray(ur), jnp.asarray(vr), 0.5)
    H = np.asarray(exact_hessian(*args, jnp.asarray(yaw), jnp.asarray(t),
                                 None))
    assert np.isfinite(H).all()
    np.testing.assert_allclose(
        H, np.swapaxes(H, 1, 2), atol=1e-6 * float(np.abs(H).max())
    )

    def grad(pose_flat):
        p = pose_flat.reshape(b, 4)
        jac, err = jacobian_and_error(
            *args, p[:, :1], p[:, 1:], None
        )
        return np.asarray(jnp.einsum("bni,bn->bi", jac, err)).ravel()

    pose = np.concatenate([yaw, t], 1).astype(np.float64).ravel()
    eps = 1e-3
    fd = np.zeros((b * 4, b * 4))
    for j in range(b * 4):
        e = np.zeros_like(pose)
        e[j] = eps
        fd[:, j] = (grad((pose + e).astype(np.float32))
                    - grad((pose - e).astype(np.float32))) / (2 * eps)
    fd_blocks = np.stack([fd[i * 4:(i + 1) * 4, i * 4:(i + 1) * 4]
                          for i in range(b)])
    scale = np.abs(fd_blocks).max()
    np.testing.assert_allclose(H, fd_blocks, atol=5e-3 * scale)

    # the Gauss-Newton part must dominate but NOT equal the exact H
    Ha = np.asarray(approx_hessian(*args, jnp.asarray(yaw), jnp.asarray(t),
                                   None))
    assert np.abs(H - Ha).max() > 1e-3 * scale


def test_pnp_uncert_exact_hessian_path():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monorun_tpu.ops.pnp import PnPConfig, pnp_uncert

    rng = np.random.default_rng(0)
    b, n = 2, 64
    X = rng.normal(0, 1, (b, n, 3)).astype(np.float32)
    yaw = rng.uniform(-1, 1, b).astype(np.float32)
    t = np.stack([rng.uniform(-1, 1, b), rng.uniform(-0.5, 0.5, b),
                  rng.uniform(6, 9, b)], 1).astype(np.float32)
    K = np.tile(np.asarray(
        [[700.0, 0, 600], [0, 700.0, 180], [0, 0, 1]], np.float32),
        (b, 1, 1))
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.stack([np.stack([c, 0 * c, s], -1),
                  np.stack([0 * c, 1 + 0 * c, 0 * c], -1),
                  np.stack([-s, 0 * c, c], -1)], 1)
    Xc = np.einsum("bij,bnj->bni", R, X) + t[:, None]
    uv = np.einsum("bij,bnj->bni", K, Xc)
    uv = (uv[..., :2] / uv[..., 2:3]).astype(np.float32)
    istd = np.ones((b, n, 2), np.float32)
    ur = np.tile(np.asarray([[-200.0, 1440.0]], np.float32), (b, 1))
    vr = np.tile(np.asarray([[-200.0, 580.0]], np.float32), (b, 1))

    outs = {}
    for ex in (False, True):
        r = pnp_uncert(
            jnp.asarray(uv), jnp.asarray(istd), jnp.asarray(X),
            jnp.asarray(K), jnp.asarray(ur), jnp.asarray(vr),
            ransac_thr=jnp.full((b,), 20.0), rng=jax.random.PRNGKey(0),
            cfg=PnPConfig(exact_hessian=ex),
        )
        assert bool(np.all(np.asarray(r.valid))), ex
        outs[ex] = np.asarray(r.pose_cov)
    # on noise-free data the residuals ~0, so exact ~= Gauss-Newton
    np.testing.assert_allclose(outs[True], outs[False], rtol=0.2,
                               atol=1e-6)
