#!/usr/bin/env python
"""Run inference on a directory of images (reference demo/infer_imgs.py).

    python demo/infer_imgs.py IMG_DIR kitti_multiclass CKPT \
        --calib demo/calib.csv --show-dir viz/
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img_dir")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--calib", required=True,
                   help="csv with the 3x3 camera intrinsic matrix")
    p.add_argument("--calib-scale", type=float, default=1.0)
    p.add_argument("--show-dir", default="viz")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    from monorun_tpu.apis.inference import (
        inference_detector, init_inference, read_calib_csv,
    )
    from monorun_tpu.utils.visualizer import show_result

    cam = read_calib_csv(args.calib)
    if args.calib_scale != 1.0:
        cam = cam.copy()
        cam[:2] *= args.calib_scale

    paths = sorted(
        sum((glob.glob(os.path.join(args.img_dir, e))
             for e in ("*.png", "*.jpg", "*.jpeg")), [])
    )
    if not paths:
        raise SystemExit(f"no images found in {args.img_dir}")
    session = init_inference(args.config, args.checkpoint)
    os.makedirs(args.show_dir, exist_ok=True)

    results = inference_detector(session, paths, [cam] * len(paths))
    for path, res in zip(paths, results):
        img = cv2.imread(path)
        out = show_result(
            img, res, cam,
            out_file=os.path.join(args.show_dir, os.path.basename(path)),
            score_thr=args.score_thr,
        )
        n = int(res["valid"].sum())
        print(f"{os.path.basename(path)}: {n} detections")


if __name__ == "__main__":
    main()
