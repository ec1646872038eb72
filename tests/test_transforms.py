"""Geometric transform tests: resize/crop invariants + inverse mapping."""

import numpy as np

from monorun_tpu.data.transforms import (
    crop_sample,
    min_iou_random_crop,
    random_crop,
    resize_sample,
)


def _sample(n_gt=3, h=96, w=160, n_pts=16, seed=0):
    rng = np.random.default_rng(seed)
    boxes = []
    for _ in range(n_gt):
        x, y = rng.uniform(0, w * 0.6), rng.uniform(0, h * 0.6)
        boxes.append([x, y, x + rng.uniform(15, 40), y + rng.uniform(15, 30)])
    boxes = np.asarray(boxes, np.float32)
    uv = np.stack(
        [rng.uniform(boxes[:, 0:1], boxes[:, 2:3] * np.ones((1, n_pts))),
         rng.uniform(boxes[:, 1:2], boxes[:, 3:4] * np.ones((1, n_pts)))],
        -1,
    ).astype(np.float32)
    return dict(
        image=rng.normal(size=(h, w, 3)).astype(np.float32),
        gt_boxes=boxes,
        gt_labels=np.arange(n_gt, dtype=np.int32),
        gt_bboxes_3d=rng.normal(size=(n_gt, 7)).astype(np.float32),
        ignore_boxes=np.asarray([[5, 5, 20, 20]], np.float32),
        uv=uv,
        oc=rng.normal(size=(n_gt, n_pts, 3)).astype(np.float32),
        pts_valid=np.ones((n_gt, n_pts), bool),
    )


def test_resize_scales_2d_not_3d():
    s = _sample()
    out = resize_sample(s, (0.5, 2.0))
    assert out["image"].shape[:2] == (48, 320)
    np.testing.assert_allclose(
        out["gt_boxes"][:, [0, 2]], s["gt_boxes"][:, [0, 2]] * 2.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        out["gt_boxes"][:, [1, 3]], s["gt_boxes"][:, [1, 3]] * 0.5, rtol=1e-6
    )
    # 3D annotations and object coords untouched
    np.testing.assert_array_equal(out["gt_bboxes_3d"], s["gt_bboxes_3d"])
    np.testing.assert_array_equal(out["oc"], s["oc"])
    np.testing.assert_allclose(out["scale_factor"], [0.5, 2.0])
    # inverse mapping recovers original pixel coords
    np.testing.assert_allclose(
        out["uv"][..., 0] / out["scale_factor"][1], s["uv"][..., 0],
        rtol=1e-5,
    )


def test_crop_shifts_and_filters():
    s = _sample()
    out = crop_sample(s, (10, 8, 150, 90))
    assert out is not None
    assert out["image"].shape[:2] == (82, 140)
    # crop offset recorded for the inverse mapping
    np.testing.assert_allclose(out["crop_offset"], [10.0, 8.0])
    # all kept boxes inside the crop
    b = out["gt_boxes"]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 140).all()
    # points outside the crop invalidated
    uv = out["uv"]
    ok = out["pts_valid"]
    assert ((uv[ok][:, 0] >= 0) & (uv[ok][:, 0] < 140)).all()


def test_crop_truncation_moves_to_ignore():
    s = _sample()
    # crop that cuts the first box heavily
    b0 = s["gt_boxes"][0]
    x_cut = int(b0[0] + 0.15 * (b0[2] - b0[0]))
    out = crop_sample(s, (0, 0, x_cut + 1, 96), trunc_ignore_thres=0.5)
    if out is not None:
        # box 0 kept only ~15% -> must not be in gt_boxes
        assert len(out["gt_boxes"]) < len(s["gt_boxes"])


def test_random_crops_return_valid_samples():
    s = _sample(seed=3)
    rng = np.random.default_rng(0)
    out = random_crop(s, (64, 96), rng)
    assert out["image"].shape[0] <= 96
    assert len(out["gt_boxes"]) >= 1
    out2 = min_iou_random_crop(s, rng)
    assert len(out2["gt_boxes"]) >= 1
