"""Synthetic fixture batches (no KITTI on disk) for tests/bench/dryruns."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..config import MonoRUnConfig


def synthetic_train_batch(
    cfg: MonoRUnConfig,
    batch: int,
    image_shape: Tuple[int, int],
    num_gt: int = 8,
    num_pts: int = 64,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """KITTI-plausible random batch matching train_forward's contract."""
    h, w = image_shape
    rng = np.random.default_rng(seed)
    G = cfg.data.max_gt if num_gt is None else num_gt
    K = len(cfg.data.classes)

    gt_valid = np.zeros((batch, G), bool)
    gt_valid[:, : max(1, G // 2)] = True
    x1 = rng.uniform(0, w * 0.7, (batch, G))
    y1 = rng.uniform(0, h * 0.6, (batch, G))
    bw = rng.uniform(w * 0.05, w * 0.3, (batch, G))
    bh = rng.uniform(h * 0.1, h * 0.4, (batch, G))
    gt_boxes = np.stack(
        [x1, y1, np.minimum(x1 + bw, w - 1), np.minimum(y1 + bh, h - 1)], -1
    ).astype(np.float32)

    dims = np.stack(
        [rng.uniform(3, 4.5, (batch, G)), rng.uniform(1.4, 1.8, (batch, G)),
         rng.uniform(1.5, 1.9, (batch, G))], -1,
    )
    xyz = np.stack(
        [rng.uniform(-8, 8, (batch, G)), rng.uniform(0.8, 1.8, (batch, G)),
         rng.uniform(8, 40, (batch, G))], -1,
    )
    ry = rng.uniform(-np.pi, np.pi, (batch, G, 1))
    gt_bboxes_3d = np.concatenate([dims, xyz, ry], -1).astype(np.float32)

    fx = w * 0.56
    cam = np.tile(
        np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32),
        (batch, 1, 1),
    )

    uv = np.stack(
        [rng.uniform(0, w, (batch, G, num_pts)),
         rng.uniform(0, h, (batch, G, num_pts))], -1,
    ).astype(np.float32)
    oc = rng.uniform(-1, 1, (batch, G, num_pts, 3)).astype(np.float32) * (
        dims[..., None, :] / 2
    ).astype(np.float32)
    pts_valid = rng.uniform(size=(batch, G, num_pts)) > 0.3

    return dict(
        images=rng.normal(0, 1, (batch, h, w, 3)).astype(np.float32),
        cam=cam,
        img_shapes=np.tile(
            np.asarray([[float(h), float(w)]], np.float32), (batch, 1)
        ),
        scale_factor=np.ones((batch, 2), np.float32),
        crop_offset=np.zeros((batch, 2), np.float32),
        gt_boxes=gt_boxes,
        gt_labels=rng.integers(0, K, (batch, G)).astype(np.int32),
        gt_valid=gt_valid,
        ignore_boxes=np.zeros((batch, 4, 4), np.float32),
        ignore_valid=np.zeros((batch, 4), bool),
        gt_bboxes_3d=gt_bboxes_3d,
        flip=rng.uniform(size=(batch,)) < 0.5,
        uv=uv,
        oc=oc,
        pts_valid=pts_valid,
    )
