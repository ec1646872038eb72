#!/usr/bin/env python
"""Evaluation CLI (replaces reference test.py + tools/test.py).

    python tools/test.py kitti_multiclass work_dirs/run/step_10000 \
        --val-set --eval bbox bev 3d --result-dir results/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate MonoRUn-TPU")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help=".pth or orbax checkpoint dir (optional: random "
                        "weights for smoke runs)")
    p.add_argument("--val-set", action="store_true",
                   help="evaluate the validation split instead of test")
    p.add_argument("--eval", nargs="*", default=["bbox", "bev", "3d"])
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--result-dir", default=None,
                   help="write KITTI submission txt files here")
    p.add_argument("--show-dir", default=None,
                   help="save camera+BEV visualisations here")
    p.add_argument("--show-score-thr", type=float, default=0.3)
    p.add_argument("--summary-file", default=None)
    p.add_argument("--criteria", default="R40", choices=["R40", "R11"])
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.add_argument("--distributed", action="store_true",
                   help="shard batches over all local devices and, under "
                        "jax.distributed, the dataset over processes "
                        "(reference: tools/test.py --launcher + "
                        "multi_gpu_test)")
    return p.parse_args()


def main():
    args = parse_args()
    from monorun_tpu.apis.inference import init_inference
    from monorun_tpu.apis.test import run_eval
    from monorun_tpu.config import apply_overrides, get_config
    from monorun_tpu.data.kitti import KITTI3DDataset

    cfg = apply_overrides(get_config(args.config), args.cfg_options)
    if args.val_set:
        root, lst, labels = cfg.data.train_root, cfg.data.val_list, True
    else:
        root, lst, labels = cfg.data.test_root, cfg.data.test_list, False
    ds = KITTI3DDataset(
        root, lst, classes=cfg.data.classes, with_labels=labels
    )
    mesh = None
    if args.distributed:
        from monorun_tpu.parallel import make_mesh

        mesh = make_mesh()
        if args.batch_size % mesh.devices.size:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be a multiple of "
                f"the mesh size {mesh.devices.size}"
            )
    session = init_inference(
        cfg, args.checkpoint, batch_size=args.batch_size, mesh=mesh,
        explicit_lazy=any(
            o.startswith("neck.lazy_lower") for o in args.cfg_options
        ),
    )
    ap = run_eval(
        session, ds, batch_size=args.batch_size, metrics=args.eval,
        result_dir=args.result_dir, show_dir=args.show_dir,
        show_score_thr=args.show_score_thr,
        distributed=args.distributed,
    )
    if args.summary_file and ap:
        import json

        with open(args.summary_file, "w") as f:
            json.dump(ap, f, indent=2)


if __name__ == "__main__":
    main()
