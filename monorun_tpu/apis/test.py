"""Evaluation loop: dataset -> batched jitted inference -> KITTI AP.

Replaces monorun/apis/test.py single_gpu_test + tools/test.py evaluation
flow — but batched (the reference forces samples_per_gpu=1,
tools/test.py:160-162) and with host data loading overlapped against
device compute via the prefetch loader.
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
) -> Dict[str, float]:
    cfg = session.cfg
    loader = PrefetchLoader(
        ds, cfg.data, batch_size, train=False, shuffle=False,
        drop_last=False,
    )
    results: List[dict] = [None] * len(ds)
    t0 = time.time()
    n_done = 0
    for batch in loader:
        det = session.run(
            batch["images"], batch["cam"], batch["img_shapes"],
            seed=int(batch["_indices"][0]),
        )
        for b, idx in enumerate(batch["_indices"]):
            idx = int(idx)
            if results[idx] is not None:
                continue   # wrapped tail duplicate
            results[idx] = dict(
                bboxes_2d=np.asarray(det.bboxes_2d[b]),
                labels=np.asarray(det.labels[b]),
                bboxes_3d=np.asarray(det.bboxes_3d[b]),
                valid=np.asarray(det.valid[b]),
            )
            n_done += 1
        if progress:
            rate = n_done / max(time.time() - t0, 1e-9)
            print(
                f"\r[eval] {n_done}/{len(ds)} ({rate:.1f} img/s)",
                end="", flush=True,
            )
    if progress:
        print()
    return ds.evaluate(
        results, metrics=metrics, result_dir=result_dir,
        print_summary=print_summary,
    )
