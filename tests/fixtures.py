"""Generate a miniature on-disk KITTI dataset for pipeline/eval drives."""

import os
import os.path as osp
import pickle

import cv2
import numpy as np


def make_mini_kitti(root: str, n_images: int = 4, seed: int = 0,
                    with_obj_crd: bool = True):
    rng = np.random.default_rng(seed)
    for sub in ("image_2", "label_2", "calib", "obj_crd", "img_metas"):
        os.makedirs(osp.join(root, sub), exist_ok=True)
    ids = [f"{i:06d}" for i in range(n_images)]
    H, W = 375, 1242
    fx = 721.5377
    cx, cy = 609.5593, 172.854
    tx = -0.06 * fx  # P2 baseline offset like real KITTI

    for name in ids:
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        cv2.imwrite(osp.join(root, "image_2", name + ".png"), img)
        with open(osp.join(root, "img_metas", name + ".txt"), "w") as f:
            f.write(f"{H},{W}")
        with open(osp.join(root, "calib", name + ".txt"), "w") as f:
            for cam in range(4):
                off = tx if cam == 2 else 0.0
                f.write(
                    f"P{cam}: {fx} 0 {cx} {off} 0 {fx} {cy} 0 0 0 1 0\n"
                )

        n_obj = int(rng.integers(1, 4))
        lines = []
        uv_list, oc_list = [], []
        for _ in range(n_obj):
            cls = rng.choice(["Car", "Pedestrian", "Cyclist", "DontCare"],
                             p=[0.6, 0.15, 0.15, 0.1])
            h3, w3, l3 = 1.5, 1.7, 4.0
            x, y, z = rng.uniform(-8, 8), rng.uniform(1.2, 1.8), rng.uniform(8, 35)
            ry = rng.uniform(-np.pi, np.pi)
            u = fx * x / z + cx
            v = fx * y / z + cy
            bw = fx * l3 / z
            bh = fx * h3 / z
            x1, y1 = max(u - bw / 2, 0), max(v - bh, 0)
            x2, y2 = min(u + bw / 2, W - 1), min(v, H - 1)
            if cls == "DontCare":
                lines.append(
                    f"DontCare -1 -1 -10 {x1:.2f} {y1:.2f} {x2:.2f} "
                    f"{y2:.2f} -1 -1 -1 -1000 -1000 -1000 -10"
                )
                uv_list.append(np.zeros((0, 2), np.float32))
                oc_list.append(np.zeros((0, 3), np.float32))
                continue
            alpha = ry - np.arctan2(x, z + 0.27)
            lines.append(
                f"{cls} 0.0 0 {alpha:.2f} {x1:.2f} {y1:.2f} {x2:.2f} "
                f"{y2:.2f} {h3} {w3} {l3} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}"
            )
            npts = int(rng.integers(16, 64))
            uv_list.append(
                np.stack([rng.uniform(x1, x2, npts),
                          rng.uniform(y1, y2, npts)], -1).astype(np.float32)
            )
            oc_list.append(
                (rng.uniform(-0.5, 0.5, (npts, 3)) * [l3, h3, w3]).astype(
                    np.float32
                )
            )
        with open(osp.join(root, "label_2", name + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        if with_obj_crd:
            with open(osp.join(root, "obj_crd", name + ".pkl"), "wb") as f:
                pickle.dump(dict(uv_list=uv_list, oc_list=oc_list), f)

    with open(osp.join(root, "train_list.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return ids
