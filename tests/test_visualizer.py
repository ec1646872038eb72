"""Visualizer smoke tests: wireframes, BEV, debug reconstruction scatter.

The scatter path mirrors image_bev_vis.py:119-141: NOC points posed into
camera frame, std-filtered (< 2x per-object mean), painted onto the BEV
canvas with the RGB of the detection's image crop.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from monorun_tpu.utils.visualizer import show_bev, show_result

CAM = np.array(
    [[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1]], np.float32
)


def _result(M=5, d=28, with_extras=True, seed=0):
    rng = np.random.default_rng(seed)
    boxes3d = np.zeros((M, 8), np.float32)
    boxes3d[:, :3] = [4.0, 1.5, 1.7]
    boxes3d[:, 3] = np.linspace(-8, 8, M)
    boxes3d[:, 4] = 1.6
    boxes3d[:, 5] = np.linspace(10, 40, M)
    boxes3d[:, 6] = 0.4
    boxes3d[:, 7] = 0.9
    res = dict(
        bboxes_2d=np.tile(
            np.array([100, 100, 300, 250, 0.9], np.float32), (M, 1)
        ),
        labels=np.zeros(M, np.int64),
        bboxes_3d=boxes3d,
        valid=np.ones(M, bool),
        pose_cov=np.tile(np.eye(4, dtype=np.float32) * 0.1, (M, 1, 1)),
    )
    if with_extras:
        res["oc_maps"] = rng.normal(0, 0.8, (M, d, d, 3)).astype(np.float32)
        res["std_maps"] = rng.uniform(0.5, 3, (M, d, d, 2)).astype(
            np.float32
        )
    return res


def test_show_result_plain():
    img = np.full((375, 1242, 3), 90, np.uint8)
    out = show_result(img, _result(with_extras=False), CAM)
    assert out.shape == (375 + 420, 1242, 3)


def test_show_result_reconstruction_scatter():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (375, 1242, 3), np.uint8)
    res = _result()
    out = show_result(img, res, CAM)
    bev = out[375:]
    # scatter paints image-RGB pixels, distinguishable from the flat
    # palette strokes by per-pixel channel spread
    painted = int(((bev != 30).any(-1) & (bev.std(-1) > 5)).sum())
    assert painted > 200, painted

    # all-high-std object contributes nothing but must not crash
    res["std_maps"][0] = 1.0
    show_result(img, res, CAM)


def test_scatter_respects_score_and_valid():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (375, 1242, 3), np.uint8)
    res = _result()
    res["bboxes_3d"][:, 7] = 0.01        # all below score_thr
    out = show_result(img, res, CAM, score_thr=0.3)
    bev = out[375:]
    painted = int(((bev != 30).any(-1) & (bev.std(-1) > 5)).sum())
    assert painted == 0, painted


def test_show_bev_without_image_skips_scatter():
    res = _result()
    canvas = show_bev(
        res["bboxes_3d"], res["labels"], CAM,
        oc_maps=res["oc_maps"], std_maps=res["std_maps"],
        image_bgr=None,
    )
    assert canvas.shape == (420, 620, 3)
