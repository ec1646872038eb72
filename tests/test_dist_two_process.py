"""Two-process jax.distributed smoke test (DCN-path plumbing).

The single-process suite covers data parallelism on an 8-virtual-device
mesh; this test covers what that cannot: `jax.distributed.initialize`
with a real coordinator, cross-process collectives (Gloo on CPU), a
train step whose gradient all-reduce spans two processes, and
`parallel.gather.allgather_results` reassembling strided eval shards —
the reference's `init_dist` + DDP + `multi_gpu_test` collect path
(reference tools/train.py:118, tools/test.py:188-198).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy  # two full-graph compiles in subprocesses

_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
rank = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{sys.argv[2]}",
    num_processes=2, process_id=rank,
)
import dataclasses
import numpy as np
import jax.numpy as jnp

from monorun_tpu.config import get_config
from monorun_tpu.parallel import make_mesh, replicate, shard_batch
from monorun_tpu.parallel.gather import allgather_results, dataset_shard
from monorun_tpu.train import create_train_state, train_step
from monorun_tpu.utils.synthetic import synthetic_train_batch

assert jax.device_count() == 2 and jax.local_device_count() == 1

cfg = get_config("kitti_multiclass")
cfg = dataclasses.replace(
    cfg,
    compute_dtype="float32",
    backbone=dataclasses.replace(cfg.backbone, depth=26),
    data=dataclasses.replace(cfg.data, pad_height=128, pad_width=256),
    rpn=dataclasses.replace(
        cfg.rpn, nms_pre=32, nms_post=32, train_nms_pre=32,
    ),
    train=dataclasses.replace(
        cfg.train, rcnn_num_samples=32, max_pos=8, rpn_num_samples=32,
    ),
)
model, state, tx = create_train_state(
    cfg, jax.random.PRNGKey(0), total_steps=10, image_shape=(128, 256),
)
mesh = make_mesh()          # global 2-device mesh, 1 device per process
state = replicate(state, mesh)
# identical global batch on both processes; shard_batch splits it over
# the mesh so each process computes grads on its half and XLA inserts
# the cross-process all-reduce
batch = synthetic_train_batch(cfg, 2, (128, 256), seed=1)
sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
jstep = jax.jit(lambda s, b, r: train_step(model, tx, s, b, r))
state, metrics = jstep(state, sharded, jax.random.PRNGKey(2))
loss = float(metrics["total_loss"])
assert np.isfinite(loss), loss
print(f"[{rank}] RESULT loss={loss:.4f}", flush=True)

# strided-shard eval collection over the two processes
total = 5
idxs = dataset_shard(total)
local = {
    int(i): {"bboxes_3d": np.full((4, 8), float(i), np.float32),
             "valid": np.zeros((4,), bool)}
    for i in idxs
}
results = allgather_results(local, total)
assert all(r is not None for r in results)
assert all(
    float(results[i]["bboxes_3d"][0, 0]) == float(i) for i in range(total)
)
print(f"[{rank}] GATHER OK", flush=True)
"""


def test_two_process_train_step_and_gather(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"[{rank}] RESULT loss=" in out, out
        assert f"[{rank}] GATHER OK" in out, out
    # the all-reduced loss must be identical across processes
    l0 = outs[0].split("RESULT loss=")[1].split()[0]
    l1 = outs[1].split("RESULT loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)
