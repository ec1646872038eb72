"""Device mesh + sharding helpers (the distributed layer).

The reference scales with torch.distributed + NCCL DDP (train.py:66-74,
tools/train.py:118, dist_params backend='nccl'). Here distribution is a
1-D 'data' mesh: the batch is sharded over it with NamedSharding, params
are replicated, and XLA compiles the gradient all-reduce into the jitted
step over ICI (intra-slice) / DCN (multi-slice). Multi-host entry is
``jax.distributed.initialize()`` + the same code.

The model has no tensor/pipeline parallelism in the reference (it fits
easily in one chip's HBM); the mesh API here is nevertheless N-D-ready:
``make_mesh((dp, mp))`` lays out extra axes for future sharded variants.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, axis_names)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading (batch) axis over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate parameters/optimizer state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
