"""Cross-process result gathering for distributed evaluation.

Replaces the reference's multi-GPU test collection (tools/test.py:188-198
-> mmcv multi_gpu_test with collect_results_gpu/tmpdir): every process
evaluates a strided shard of the dataset, then the per-sample result
dicts — fixed-shape by construction (max_per_img padding) — are stacked
into arrays and all-gathered over DCN with
``jax.experimental.multihost_utils.process_allgather`` instead of
NCCL broadcast or a tmpdir rendezvous.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np


def dataset_shard(n: int, rank: Optional[int] = None,
                  world: Optional[int] = None) -> np.ndarray:
    """Strided index shard for this process (reference: DistributedSampler
    round-robin without padding — the gather reassembles by index)."""
    rank = jax.process_index() if rank is None else rank
    world = jax.process_count() if world is None else world
    return np.arange(rank, n, world)


def allgather_results(
    local: Dict[int, Dict[str, np.ndarray]], total: int,
) -> List[Optional[dict]]:
    """Combine {dataset_index: result_dict} shards from all processes into
    the dense length-``total`` result list.

    Single-process (tests, one host) is a pure reassembly; multi-host
    stacks each field into one (n_local, ...) array and process_allgathers
    it (all shards are fixed-shape: every result dict holds max_per_img-
    padded arrays, so concatenation over hosts is well-defined).
    """
    results: List[Optional[dict]] = [None] * total
    if jax.process_count() == 1:
        for idx, r in local.items():
            results[idx] = r
        return results

    from jax.experimental import multihost_utils

    assert total >= jax.process_count(), (
        "every process must own >=1 sample (collective field sets must "
        "match across processes)"
    )
    idxs = np.asarray(sorted(local), np.int32)
    keys = sorted(next(iter(local.values()))) if local else []
    # process_allgather needs equal shapes on every process: pad the local
    # count up to ceil(total/world) and mark padding with index -1.
    cap = -(-total // jax.process_count())
    pad = cap - len(idxs)
    idxs_p = np.concatenate([idxs, np.full(pad, -1, np.int32)])
    stacked = {
        k: np.concatenate([
            np.stack([local[int(i)][k] for i in idxs]),
            np.zeros((pad,) + local[int(idxs[0])][k].shape,
                     local[int(idxs[0])][k].dtype),
        ]) if pad else np.stack([local[int(i)][k] for i in idxs])
        for k in keys
    }
    g_idx = multihost_utils.process_allgather(idxs_p, tiled=True)
    g_fields = {
        k: multihost_utils.process_allgather(v, tiled=True)
        for k, v in stacked.items()
    }
    for j, idx in enumerate(np.asarray(g_idx)):
        if int(idx) >= 0:
            results[int(idx)] = {
                k: np.asarray(v[j]) for k, v in g_fields.items()
            }
    return results
