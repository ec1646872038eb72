"""Consistency of the synthetic scene generator (the in-env stand-in for
KITTI + LiDAR object-coordinate data): projecting the supervision points
through the GT pose must land exactly on their pixels, the image texture
must carry the encoded NOC values, and PnP on the GT correspondences must
recover the GT pose."""

import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.config import get_config
from monorun_tpu.utils.synthetic import synthetic_scene_batch


def _batch(n=2, hw=(96, 192), num_gt=4, num_pts=64, seed=3):
    cfg = get_config("kitti_multiclass_lidar_supv")
    return cfg, synthetic_scene_batch(
        cfg, n, hw, num_gt=num_gt, num_pts=num_pts, seed=seed
    )


def test_supervision_points_project_onto_their_pixels():
    cfg, b = _batch()
    K = b["cam"][0]
    for bi in range(b["images"].shape[0]):
        for g in range(b["gt_boxes"].shape[1]):
            if not b["gt_valid"][bi, g] or not b["pts_valid"][bi, g].any():
                continue
            l3d = b["gt_bboxes_3d"][bi, g]
            ry = l3d[6]
            c, s = np.cos(ry), np.sin(ry)
            R = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            pts_cam = b["oc"][bi, g] @ R.T + l3d[3:6]
            uvz = pts_cam @ K.T
            uv = uvz[:, :2] / uvz[:, 2:3]
            ok = b["pts_valid"][bi, g]
            # pixel-center rays: reprojection must hit the sampled pixel
            # to sub-pixel accuracy
            np.testing.assert_allclose(
                uv[ok], b["uv"][bi, g][ok], atol=0.51
            )
            # oc lies inside the box (bottom-center origin)
            oc = b["oc"][bi, g][ok]
            assert (oc[:, 1] <= 1e-3).all() and (oc[:, 1] >= -l3d[1] - 1e-3).all()


def test_image_texture_encodes_noc():
    cfg, b = _batch()
    means = np.asarray(cfg.noc_head.noc_means)
    stds = np.asarray(cfg.noc_head.noc_stds)
    bi = 0
    for g in range(b["gt_boxes"].shape[1]):
        if not b["gt_valid"][bi, g]:
            continue
        ok = b["pts_valid"][bi, g]
        uv = b["uv"][bi, g][ok].astype(int)
        oc = b["oc"][bi, g][ok]
        expect = (oc / np.clip(b["gt_bboxes_3d"][bi, g, :3], 1e-5, None)
                  - means) / stds
        got = b["images"][bi, uv[:, 1], uv[:, 0]]
        # occluding nearer objects may overwrite a minority of pixels
        match = np.isclose(got, expect, atol=1e-4).all(axis=1)
        assert match.mean() > 0.85


def test_pnp_recovers_gt_pose_from_scene_points():
    from monorun_tpu.ops.pnp import PnPConfig, pnp_uncert

    cfg, b = _batch(n=1, num_pts=128, seed=5)
    bi = 0
    rois = []
    for g in range(b["gt_boxes"].shape[1]):
        if b["gt_valid"][bi, g] and b["pts_valid"][bi, g].all():
            rois.append(g)
    assert rois, "no fully-covered object in the scene"
    g = rois[0]
    uv = jnp.asarray(b["uv"][bi, g][None])            # (1, Q, 2)
    oc = jnp.asarray(b["oc"][bi, g][None])            # (1, Q, 3)
    istd = jnp.ones_like(uv)
    cam = jnp.asarray(b["cam"][bi][None])
    h, w = b["images"].shape[1:3]
    u_range = jnp.asarray([[-200.0, w + 200.0]])
    v_range = jnp.asarray([[-200.0, h + 200.0]])
    box = b["gt_boxes"][bi, g]
    thr = jnp.asarray([0.2 * (box[3] - box[1])])
    out = pnp_uncert(
        uv, istd, oc, cam, u_range, v_range, ransac_thr=thr,
        rng=jax.random.PRNGKey(0),
        cfg=PnPConfig(ransac_hypotheses=8, lm_iters=8),
    )
    assert bool(out.valid[0])
    gt = b["gt_bboxes_3d"][bi, g]
    np.testing.assert_allclose(np.asarray(out.t_vec[0]), gt[3:6], atol=0.05)
    dyaw = (float(out.yaw[0, 0]) - gt[6] + np.pi) % (2 * np.pi) - np.pi
    assert abs(dyaw) < 0.02
