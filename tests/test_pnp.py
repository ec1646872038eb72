import cv2
import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.ops.geometry import yaw_rotation_matrix
from monorun_tpu.ops.pnp import (
    PnPConfig,
    dlt_yaw_pnp,
    istd_inlier_mask,
    pnp_uncert,
)

K = np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1.0]], np.float32)


def _make_problem(b=4, n=64, seed=0, noise=0.0, outlier_frac=0.0):
    rng = np.random.default_rng(seed)
    yaw = rng.uniform(-np.pi, np.pi, (b, 1)).astype(np.float32)
    t = np.stack(
        [rng.uniform(-8, 8, b), rng.uniform(-0.5, 1.5, b),
         rng.uniform(8, 45, b)], -1,
    ).astype(np.float32)
    # box-like point cloud
    pts = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32) * np.array(
        [2.0, 0.8, 0.9], np.float32
    )
    uv = np.zeros((b, n, 2), np.float32)
    for i in range(b):
        R = np.asarray(yaw_rotation_matrix(jnp.asarray(yaw[i, 0])))
        cam = pts[i] @ R.T + t[i]
        p = cam @ K.T
        uv[i] = p[:, :2] / p[:, 2:3]
    uv += rng.normal(0, noise, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, (b, n_out))
        for i in range(b):
            uv[i, idx[i]] += rng.uniform(40, 120, (n_out, 2)) * rng.choice(
                [-1, 1], (n_out, 2)
            )
    istd = np.full((b, n, 2), 1.0, np.float32)
    cams = np.tile(K, (b, 1, 1))
    ur = np.tile(np.asarray([-200.0, 1442.0], np.float32), (b, 1))
    vr = np.tile(np.asarray([-200.0, 575.0], np.float32), (b, 1))
    return dict(yaw=yaw, t=t, pts=pts, uv=uv, istd=istd, cams=cams,
                ur=ur, vr=vr)


def _ang_diff(a, b):
    return np.abs((a - b + np.pi) % (2 * np.pi) - np.pi)


def test_dlt_exact_recovery():
    p = _make_problem(noise=0.0)
    yaw, t = dlt_yaw_pnp(
        jnp.asarray(p["uv"]), jnp.ones(p["uv"].shape[:2]),
        jnp.asarray(p["pts"]), jnp.asarray(p["cams"]),
    )
    assert _ang_diff(np.asarray(yaw), p["yaw"]).max() < 1e-2
    np.testing.assert_allclose(np.asarray(t), p["t"], atol=0.05)


def test_pnp_noisy_matches_cv2():
    p = _make_problem(b=3, n=48, seed=1, noise=1.0)
    res = pnp_uncert(
        jnp.asarray(p["uv"]), jnp.asarray(p["istd"]), jnp.asarray(p["pts"]),
        jnp.asarray(p["cams"]), jnp.asarray(p["ur"]), jnp.asarray(p["vr"]),
    )
    assert np.asarray(res.valid).all()
    for i in range(3):
        ok, rvec, tvec = cv2.solvePnP(
            p["pts"][i].astype(np.float64), p["uv"][i].astype(np.float64),
            K.astype(np.float64), np.zeros(5),
            flags=cv2.SOLVEPNP_ITERATIVE,
        )
        assert ok
        # our solver is yaw-constrained; both should be near GT
        assert _ang_diff(float(res.yaw[i, 0]), p["yaw"][i, 0]) < 0.05
        # depth is weakly constrained by 1px noise at ~30m: allow 2% on z
        tol = np.asarray([0.3, 0.3, 0.02 * p["t"][i, 2]])
        assert (np.abs(np.asarray(res.t_vec)[i] - p["t"][i]) < tol).all()
        assert (np.abs(np.asarray(res.t_vec)[i] - tvec[:, 0]) < 2 * tol).all()


def test_ransac_rejects_outliers():
    p = _make_problem(b=3, n=64, seed=2, noise=0.5, outlier_frac=0.25)
    thr = jnp.full((3,), 8.0)
    res = pnp_uncert(
        jnp.asarray(p["uv"]), jnp.asarray(p["istd"]), jnp.asarray(p["pts"]),
        jnp.asarray(p["cams"]), jnp.asarray(p["ur"]), jnp.asarray(p["vr"]),
        ransac_thr=thr, rng=jax.random.PRNGKey(3),
    )
    assert np.asarray(res.valid).all()
    assert _ang_diff(np.asarray(res.yaw)[:, 0], p["yaw"][:, 0]).max() < 0.08
    np.testing.assert_allclose(np.asarray(res.t_vec), p["t"], atol=0.5)
    # without RANSAC the same data must be notably worse
    res_plain = pnp_uncert(
        jnp.asarray(p["uv"]), jnp.asarray(p["istd"]), jnp.asarray(p["pts"]),
        jnp.asarray(p["cams"]), jnp.asarray(p["ur"]), jnp.asarray(p["vr"]),
    )
    err_ransac = np.abs(np.asarray(res.t_vec) - p["t"]).max()
    err_plain = np.abs(np.asarray(res_plain.t_vec) - p["t"]).max()
    assert err_ransac < err_plain


def test_istd_prefilter_downweights_bad_points():
    p = _make_problem(b=1, n=32, seed=3, noise=0.2)
    # corrupt 8 points and mark them with tiny istd
    p["uv"][0, :8] += 300.0
    p["istd"][0, :8] = 0.01
    mask = istd_inlier_mask(jnp.asarray(p["istd"]), 0.6)
    assert not np.asarray(mask)[0, :8].any()
    assert np.asarray(mask)[0, 8:].all()
    res = pnp_uncert(
        jnp.asarray(p["uv"]), jnp.asarray(p["istd"]), jnp.asarray(p["pts"]),
        jnp.asarray(p["cams"]), jnp.asarray(p["ur"]), jnp.asarray(p["vr"]),
    )
    assert _ang_diff(float(res.yaw[0, 0]), p["yaw"][0, 0]) < 0.05
    np.testing.assert_allclose(np.asarray(res.t_vec)[0], p["t"][0], atol=0.3)


def test_istd_mask_keep_all_fallback():
    istd = np.full((1, 16, 2), 0.01, np.float32)
    istd[0, :2] = 10.0  # only 2 pass the threshold -> keep all
    mask = istd_inlier_mask(jnp.asarray(istd), 0.6)
    assert np.asarray(mask).all()


def test_covariance_scales_with_noise():
    covs = []
    for istd_val in (2.0, 0.5):
        p = _make_problem(b=2, n=48, seed=4, noise=1.0 / istd_val)
        p["istd"][:] = istd_val
        res = pnp_uncert(
            jnp.asarray(p["uv"]), jnp.asarray(p["istd"]),
            jnp.asarray(p["pts"]), jnp.asarray(p["cams"]),
            jnp.asarray(p["ur"]), jnp.asarray(p["vr"]),
        )
        covs.append(np.trace(np.asarray(res.pose_cov), axis1=1, axis2=2))
    # higher istd (less noise) -> smaller covariance
    assert (covs[0] < covs[1]).all()


def test_degenerate_points_flagged_invalid():
    # all 3D points identical -> singular normal matrix -> eigen guard
    uv = np.tile(np.asarray([[300.0, 200.0]], np.float32), (1, 16, 1))
    pts = np.zeros((1, 16, 3), np.float32)
    res = pnp_uncert(
        jnp.asarray(uv), jnp.ones((1, 16, 2)), jnp.asarray(pts),
        jnp.asarray(K[None]), jnp.asarray([[-200.0, 1442.0]]),
        jnp.asarray([[-200.0, 575.0]]),
    )
    assert not np.asarray(res.valid)[0]
    assert np.isfinite(np.asarray(res.pose_cov)).all()


def test_pnp_is_jittable_and_fixed_shape():
    p = _make_problem(b=2, n=32, seed=5, noise=0.5)
    fn = jax.jit(
        lambda uv, istd, pts, cams, ur, vr: pnp_uncert(
            uv, istd, pts, cams, ur, vr,
            ransac_thr=jnp.full((2,), 10.0), rng=jax.random.PRNGKey(0),
        )
    )
    res = fn(
        jnp.asarray(p["uv"]), jnp.asarray(p["istd"]), jnp.asarray(p["pts"]),
        jnp.asarray(p["cams"]), jnp.asarray(p["ur"]), jnp.asarray(p["vr"]),
    )
    assert res.pose_cov.shape == (2, 4, 4)
    assert res.inlier_mask.shape == (2, 32)
