"""Evaluation loop: dataset -> batched jitted inference -> KITTI AP.

Replaces monorun/apis/test.py single_gpu_test + tools/test.py evaluation
flow — but batched (the reference forces samples_per_gpu=1,
tools/test.py:160-162) and with host data loading overlapped against
device compute via the prefetch loader.

Distributed eval (reference multi_gpu_test + collect_results,
tools/test.py:188-198): pass ``mesh`` to shard each inference batch over
the local devices; across hosts each process walks its strided dataset
shard (``parallel.dataset_shard``) and the per-sample results are
reassembled with ``parallel.allgather_results`` over DCN instead of the
reference's NCCL/tmpdir collection.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from ..config import MonoRUnConfig
from ..data.kitti import KITTI3DDataset
from ..data.loader import PrefetchLoader
from .inference import InferenceSession


def run_eval(
    session: InferenceSession,
    ds: KITTI3DDataset,
    batch_size: int = 4,
    metrics=("bbox", "bev", "3d"),
    result_dir: Optional[str] = None,
    print_summary: bool = True,
    progress: bool = True,
    show_dir: Optional[str] = None,
    show_score_thr: float = 0.3,
    distributed: bool = False,
) -> Dict[str, float]:
    cfg = session.cfg
    indices = None
    if distributed:
        from ..parallel import dataset_shard

        indices = dataset_shard(len(ds))
    loader = PrefetchLoader(
        ds, cfg.data, batch_size, train=False, shuffle=False,
        drop_last=False, indices=indices,
    )
    local: Dict[int, dict] = {}
    t0 = time.time()
    n_total = len(ds) if indices is None else len(indices)
    for batch in loader:
        det = session.run(
            batch["images"], batch["cam"], batch["img_shapes"],
            seed=int(batch["_indices"][0]),
        )
        for b, idx in enumerate(batch["_indices"]):
            idx = int(idx)
            if idx in local:
                continue   # wrapped tail duplicate
            inv_s = 1.0 / float(cfg.data.test_scale)
            local[idx] = dict(
                # fast-preset downscale: 2D boxes back to native image
                # coords (3D outputs are metric already — intrinsics
                # were scaled with the image in prepare_test_sample)
                bboxes_2d=np.asarray(det.bboxes_2d[b]) * inv_s,
                labels=np.asarray(det.labels[b]),
                bboxes_3d=np.asarray(det.bboxes_3d[b]),
                valid=np.asarray(det.valid[b]),
                pose_cov=np.asarray(det.pose_cov[b]),
            )
            if det.extras:
                # cfg.test.debug extras feed the BEV reconstruction
                # scatter in the visualizer (image_bev_vis.py:119-141)
                local[idx].update(
                    {k: np.asarray(v[b]) for k, v in det.extras.items()}
                )
            if show_dir is not None:
                import os

                import cv2

                from ..utils.visualizer import show_result

                os.makedirs(show_dir, exist_ok=True)
                img = cv2.imread(ds.image_path(idx))
                ann = ds.get_ann(idx)
                show_result(
                    img, local[idx], ann["cam_intrinsic"],
                    out_file=os.path.join(
                        show_dir, os.path.basename(ds.image_path(idx))
                    ),
                    score_thr=show_score_thr,
                )
        if progress:
            rate = len(local) / max(time.time() - t0, 1e-9)
            print(
                f"\r[eval] {len(local)}/{n_total} ({rate:.1f} img/s)",
                end="", flush=True,
            )
    if progress:
        print()
    if distributed:
        from ..parallel import allgather_results

        results = allgather_results(local, len(ds))
    else:
        results = [None] * len(ds)
        for idx, r in local.items():
            results[idx] = r
    return ds.evaluate(
        results, metrics=metrics, result_dir=result_dir,
        print_summary=print_summary,
    )
