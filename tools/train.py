#!/usr/bin/env python
"""Training CLI (replaces reference train.py + tools/train.py).

    python tools/train.py kitti_multiclass_lidar_supv \
        --work-dir work_dirs/lidar_supv \
        --cfg-options train.lr=1e-4 data.train_root=/data/kitti/training/

No process-spawn launcher needed: jax.distributed picks up multi-host
environments automatically; single-host multi-chip is one process.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def parse_args():
    p = argparse.ArgumentParser(description="Train MonoRUn-TPU")
    p.add_argument("config", help="preset name (e.g. kitti_multiclass)")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None,
                   help="warm-start weights (.pth or orbax dir)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        import jax

        jax.distributed.initialize()

    from monorun_tpu.config import apply_overrides, get_config
    from monorun_tpu.apis.train import train_detector
    from monorun_tpu.data.kitti import KITTI3DDataset

    cfg = get_config(args.config)
    if args.seed is not None:
        cfg = apply_overrides(cfg, [f"train.seed={args.seed}"])
    cfg = apply_overrides(cfg, args.cfg_options)

    workdir = args.work_dir or os.path.join("work_dirs", cfg.name)
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.txt"), "w") as f:
        f.write(repr(cfg))

    val_ds = None
    if not args.no_validate and cfg.train.eval_interval:
        val_ds = KITTI3DDataset(
            cfg.data.train_root, cfg.data.val_list, classes=cfg.data.classes
        )
    train_detector(
        cfg, workdir,
        resume_from=args.resume_from,
        load_from=args.load_from,
        max_steps=args.max_steps,
        val_ds=val_ds,
    )


if __name__ == "__main__":
    main()
