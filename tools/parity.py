#!/usr/bin/env python
"""One-command released-checkpoint parity runbook.

The moment real KITTI data and the released ``.pth`` checkpoints exist
(reference README.md:93-97), this executes the reference's validation
protocol (reference tools/test.py:208-217 -> kitti3d_dataset.evaluate)
with every default deviation disabled, and prints the measured APs:

    python tools/parity.py data/kitti kitti_multiclass_lidar_supv.pth \
        [--config kitti_multiclass] [--batch-size 4] [--activations]
        [--summary-file parity.json]

Parity mode forces (vs the serving defaults):
  - ``neck.lazy_lower = False``   dense reference stride-2 FPN level
                                  (fpn_plus.py:79-91 semantics)
  - ``test.head_slots = 0``       3D heads on ALL detection slots, like
                                  the reference's dynamic NMS-survivor set
  - ``compute_dtype = float32``   no bf16 rounding in the comparison

``--activations`` additionally loads the SAME ``.pth`` into the
plain-torch torso replica (tests/torch_ref/backbone.py, reference
state-dict key names) and prints stage-by-stage activation deviations on
the first validation image — pinpointing any silent layout/ordering skew
in the composed backbone -> FPNplus -> RPN pipeline before it shows up
as an AP delta.

Success criterion (SURVEY.md section 6 / BASELINE.md): Car AP3D/APBEV
R40 on ``mono3dsplit_val_list`` within noise of the reference
implementation run on the same checkpoint; the published *test-server*
anchors for the lidar-supervised model are AP3D 19.65/12.30/10.58 and
APBEV 27.94/17.34/15.24 (easy/mod/hard, arXiv 2103.12605) — val APs run
higher than test-server APs, so compare val-to-val.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def parse_args():
    p = argparse.ArgumentParser(description="Released-checkpoint parity run")
    p.add_argument("kitti_root", help="KITTI object root containing "
                   "training/ (image_2, calib, label_2) and the split "
                   "list files")
    p.add_argument("checkpoint", help="converted-or-released .pth, or an "
                   "orbax checkpoint dir")
    p.add_argument("--config", default="kitti_multiclass")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--activations", action="store_true",
                   help="also diff composed-torso activations vs the "
                        "plain-torch replica on the first val image")
    p.add_argument("--result-dir", default=None)
    p.add_argument("--summary-file", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def parity_config(name: str, kitti_root: str, overrides):
    from monorun_tpu.config import apply_overrides, get_config

    cfg = get_config(name)
    root = os.path.join(kitti_root, "training") + os.sep
    cfg = dataclasses.replace(
        cfg,
        compute_dtype="float32",
        neck=dataclasses.replace(cfg.neck, lazy_lower=False),
        test=dataclasses.replace(cfg.test, head_slots=0),
        data=dataclasses.replace(cfg.data, train_root=root),
    )
    return apply_overrides(cfg, overrides)


def diff_activations(cfg, session, ds, checkpoint):
    """Stage-by-stage composed-pipeline diff vs the torch replica."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
    from torch_ref.backbone import DetectorTorso

    from monorun_tpu.data.pipeline import load_image, normalize_pad

    torso = DetectorTorso(depth=cfg.backbone.depth)
    sd = torch.load(checkpoint, map_location="cpu")
    sd = sd.get("state_dict", sd)
    missing, unexpected = torso.load_state_dict(sd, strict=False)
    print(f"[activations] torch replica: {len(missing)} replica keys "
          f"missing from ckpt, {len(unexpected)} ckpt keys outside the "
          f"torso (3D heads — diffed via AP, not here)")
    torso.eval()

    img = load_image(ds.image_path(0))
    img_n, _ = normalize_pad(img, cfg.data)
    x = img_n[None]

    model, variables = session.model, session.variables

    def fwd(m, xx):
        feats = m.backbone(xx)
        fpn = m.neck(feats)
        cls_scores, bbox_preds = m.run_rpn(fpn)
        return feats, fpn, cls_scores, bbox_preds

    j_feats, j_fpn, j_cls, j_reg = jax.jit(
        lambda v, xx: model.apply(v, xx, method=fwd)
    )(variables, jnp.asarray(x))
    with torch.no_grad():
        t_feats, t_fpn, t_cls, t_reg = torso.stages(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy()))

    def report(tag, a, b):
        a = np.asarray(a, np.float32)
        b = np.moveaxis(b.numpy(), 1, -1).astype(np.float32)
        scale = max(float(np.std(b)), 1e-9)
        d = float(np.abs(a - b).max())
        print(f"  {tag:<28s} max|d| {d:10.3e}   ({d / scale:8.2e} "
              f"of stage std {scale:.3e})")

    print("[activations] composed-pipeline stage deviations:")
    for i, (a, b) in enumerate(zip(j_feats, t_feats)):
        report(f"backbone C{i + 2}", a, b)
    for i, (a, b) in enumerate(zip(j_fpn, t_fpn)):
        report(f"fpn P{i + 1} (stride {2 ** (i + 1)})", a, b)
    for i, (a, b) in enumerate(zip(j_cls, t_cls)):
        report(f"rpn cls lvl {i}", a, b)
    for i, (a, b) in enumerate(zip(j_reg, t_reg)):
        report(f"rpn reg lvl {i}", a, b)


def main():
    args = parse_args()
    from monorun_tpu.apis.inference import init_inference
    from monorun_tpu.apis.test import run_eval
    from monorun_tpu.data.kitti import KITTI3DDataset

    cfg = parity_config(args.config, args.kitti_root, args.cfg_options)
    print(f"[parity] deviations OFF: lazy_lower={cfg.neck.lazy_lower} "
          f"head_slots={cfg.test.head_slots} dtype={cfg.compute_dtype}")
    ds = KITTI3DDataset(
        cfg.data.train_root, cfg.data.val_list,
        classes=cfg.data.classes, with_labels=True,
    )
    print(f"[parity] val split: {len(ds)} images from {cfg.data.train_root}")
    session = init_inference(
        cfg, args.checkpoint, batch_size=args.batch_size,
        explicit_lazy=True,   # we set lazy_lower=False ourselves
    )
    if args.activations:
        diff_activations(cfg, session, ds, args.checkpoint)

    summary = run_eval(
        session, ds, batch_size=args.batch_size,
        metrics=("bbox", "bev", "3d"),   # AOS rides along with bbox
                                         # when alphas are valid
        result_dir=args.result_dir, print_summary=True,
    )
    if args.summary_file:
        with open(args.summary_file, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"[parity] summary -> {args.summary_file}")
    print("[parity] compare Car_3d/Car_bev R40 rows against the reference "
          "implementation's eval of the SAME checkpoint on this split "
          "(reference tools/test.py --val-set); published test-server "
          "anchors are in BASELINE.md.")


if __name__ == "__main__":
    main()
