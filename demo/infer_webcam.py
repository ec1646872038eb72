#!/usr/bin/env python
"""Live webcam inference (reference demo/infer_webcam.py).

    python demo/infer_webcam.py kitti_multiclass CKPT --calib demo/calib.csv
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import cv2
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--calib", required=True)
    p.add_argument("--camera-id", type=int, default=0)
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    from monorun_tpu.apis.inference import init_inference, read_calib_csv
    from monorun_tpu.config import get_config
    from monorun_tpu.data.pipeline import normalize_pad
    from monorun_tpu.utils.visualizer import show_result

    cam = read_calib_csv(args.calib)
    session = init_inference(args.config, args.checkpoint)
    cfg = session.cfg

    cap = cv2.VideoCapture(args.camera_id)
    if not cap.isOpened():
        raise SystemExit(f"cannot open camera {args.camera_id}")
    print("press q to quit")
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        t0 = time.time()
        rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB).astype(np.float32)
        rgb = rgb[: cfg.data.pad_height, : cfg.data.pad_width]
        padded, (rh, rw) = normalize_pad(rgb, cfg.data)
        det = session.run(
            padded[None], cam[None].astype(np.float32),
            np.asarray([[float(rh), float(rw)]], np.float32),
        )
        res = dict(
            bboxes_2d=np.asarray(det.bboxes_2d[0]),
            labels=np.asarray(det.labels[0]),
            bboxes_3d=np.asarray(det.bboxes_3d[0]),
            valid=np.asarray(det.valid[0]),
            pose_cov=np.asarray(det.pose_cov[0]),
        )
        out = show_result(frame, res, cam, score_thr=args.score_thr)
        fps = 1.0 / max(time.time() - t0, 1e-6)
        cv2.putText(out, f"{fps:.1f} fps", (10, 30),
                    cv2.FONT_HERSHEY_SIMPLEX, 1, (255, 255, 255), 2)
        cv2.imshow("monorun_tpu", out)
        if cv2.waitKey(1) & 0xFF == ord("q"):
            break
    cap.release()
    cv2.destroyAllWindows()


if __name__ == "__main__":
    main()
