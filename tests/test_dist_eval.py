"""Distributed evaluation: dataset sharding, sharded inference, gather.

Covers the TPU-native replacement of the reference's multi-GPU test path
(tools/test.py:188-198, mmcv multi_gpu_test + collect_results): strided
per-process dataset shards, batch sharding over the device mesh inside
one jitted program, and index-keyed result reassembly.
"""

import dataclasses

import jax
import numpy as np

from monorun_tpu.apis.inference import InferenceSession
from monorun_tpu.apis.test import run_eval
from monorun_tpu.config import get_config
from monorun_tpu.data.loader import PrefetchLoader
from monorun_tpu.models.detector import init_detector
from monorun_tpu.parallel import (
    allgather_results,
    dataset_shard,
    make_mesh,
)


def test_dataset_shard_partitions_exactly():
    n, world = 23, 4
    shards = [dataset_shard(n, rank=r, world=world) for r in range(world)]
    combined = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(combined, np.arange(n))


def test_allgather_results_single_process_reassembly():
    local = {
        3: {"a": np.ones((2, 4))},
        0: {"a": np.zeros((2, 4))},
    }
    out = allgather_results(local, total=5)
    assert out[1] is None and out[2] is None and out[4] is None
    np.testing.assert_array_equal(out[0]["a"], np.zeros((2, 4)))
    np.testing.assert_array_equal(out[3]["a"], np.ones((2, 4)))


def test_loader_indices_subset(tmp_path):
    from fixtures import make_mini_kitti

    from monorun_tpu.data.kitti import KITTI3DDataset

    root = str(tmp_path / "kitti")
    make_mini_kitti(root, n_images=6)
    cfg = get_config("kitti_multiclass")
    ds = KITTI3DDataset(
        root, "train_list.txt", classes=cfg.data.classes,
        with_labels=True,
    )
    shard = dataset_shard(len(ds), rank=1, world=2)      # [1, 3, 5]
    loader = PrefetchLoader(
        ds, cfg.data, batch_size=2, train=False, shuffle=False,
        drop_last=False, indices=shard,
    )
    seen = [int(i) for b in loader for i in b["_indices"]]
    assert set(seen) == set(shard.tolist())


def tiny_config():
    cfg = get_config("kitti_multiclass")
    return dataclasses.replace(
        cfg,
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depth=26),
        rpn=dataclasses.replace(
            cfg.rpn, nms_pre=64, nms_post=64
        ),
        test=dataclasses.replace(
            cfg.test, rpn_nms_pre=64, rpn_nms_post=64, max_per_img=8
        ),
        global_head=dataclasses.replace(cfg.global_head, mc_samples=4),
        pose_head=dataclasses.replace(
            cfg.pose_head, ransac_hypotheses=4, lm_iters=3
        ),
    )


def test_mesh_sharded_inference_matches_single_device():
    cfg = tiny_config()
    model, variables = init_detector(cfg, jax.random.PRNGKey(0), (64, 128))
    B, H, W = 8, 64, 128
    rng = np.random.default_rng(0)
    images = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    cam = np.tile(
        np.array([[70.0, 0, 64], [0, 70.0, 32], [0, 0, 1]], np.float32),
        (B, 1, 1),
    )
    shapes = np.full((B, 2), (64.0, 128.0), np.float32)

    plain = InferenceSession(cfg, variables, batch_size=B)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = InferenceSession(cfg, variables, batch_size=B, mesh=mesh)

    # partitioning changes XLA fusion/reduction order, so exact equality
    # with the single-device program is not expected — only closeness
    # (differences amplify a little through the PnP refinement)
    d0 = plain.run(images, cam, shapes, seed=7)
    d1 = sharded.run(images, cam, shapes, seed=7)
    np.testing.assert_allclose(
        np.asarray(d0.bboxes_3d), np.asarray(d1.bboxes_3d),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_array_equal(
        np.asarray(d0.valid), np.asarray(d1.valid)
    )

    # the hard guarantee: no cross-sample contamination. With 1 sample
    # per device, sample 0's outputs must be BITWISE identical no matter
    # what the other samples contain.
    images2 = images.copy()
    images2[1:] = rng.normal(size=(B - 1, H, W, 3)).astype(np.float32)
    d2 = sharded.run(images2, cam, shapes, seed=7)
    np.testing.assert_array_equal(
        np.asarray(d1.bboxes_3d[0]), np.asarray(d2.bboxes_3d[0])
    )
    np.testing.assert_array_equal(
        np.asarray(d1.valid[0]), np.asarray(d2.valid[0])
    )


class _StubDet:
    def __init__(self, B, M):
        r = np.random.default_rng(3)
        self.bboxes_2d = r.uniform(0, 50, (B, M, 4)).astype(np.float32)
        self.labels = np.zeros((B, M), np.int32)
        self.bboxes_3d = r.uniform(0, 1, (B, M, 8)).astype(np.float32)
        self.valid = np.zeros((B, M), bool)
        self.pose_cov = np.tile(np.eye(4, dtype=np.float32), (B, M, 1, 1))
        self.extras = {}   # debug maps absent (test.debug off)


class _StubSession:
    """Stands in for InferenceSession: fixed-shape empty detections."""

    def __init__(self, cfg, M=4):
        self.cfg = cfg
        self.M = M

    def run(self, images, cam, shapes, seed=0):
        return _StubDet(images.shape[0], self.M)


def test_run_eval_distributed_assembles_all_indices(tmp_path, monkeypatch):
    from fixtures import make_mini_kitti

    from monorun_tpu.data.kitti import KITTI3DDataset

    root = str(tmp_path / "kitti")
    make_mini_kitti(root, n_images=5)
    cfg = get_config("kitti_multiclass")
    ds = KITTI3DDataset(
        root, "train_list.txt", classes=cfg.data.classes,
        with_labels=True,
    )
    captured = {}
    orig_eval = ds.evaluate

    def spy(results, **kw):
        captured["results"] = results
        return orig_eval(results, **kw)

    monkeypatch.setattr(ds, "evaluate", spy)
    ap = run_eval(
        _StubSession(cfg), ds, batch_size=2, print_summary=False,
        progress=False, distributed=True,
    )
    assert all(r is not None for r in captured["results"])
    assert len(captured["results"]) == len(ds)
    assert isinstance(ap, dict)


def test_format_results_tolerates_missing_entries(tmp_path):
    """A None slot (under-covered distributed shard, dropped tail) must
    become an empty annotation, not a TypeError — and still evaluate."""
    from fixtures import make_mini_kitti

    from monorun_tpu.data.kitti import KITTI3DDataset

    root = str(tmp_path / "kitti")
    make_mini_kitti(root, n_images=3)
    cfg = get_config("kitti_multiclass")
    ds = KITTI3DDataset(
        root, "train_list.txt", classes=cfg.data.classes, with_labels=True
    )
    M = 4
    full = dict(
        bboxes_2d=np.asarray([[10.0, 10, 80, 60]] * M, np.float32),
        labels=np.zeros(M, np.int64),
        bboxes_3d=np.tile(
            np.asarray([[3.9, 1.5, 1.6, 1.0, 1.0, 15.0, 0.1, 0.9]],
                       np.float32), (M, 1),
        ),
        valid=np.asarray([True, True, False, False]),
    )
    results = [full, None, full]          # index 1 missing
    annos = ds.format_results(results)
    assert len(annos) == 3
    assert len(annos[1]["name"]) == 0
    assert annos[1]["bbox"].shape == (0, 4)
    assert len(annos[0]["name"]) == 2
    # the full evaluate path must also survive the hole
    ap = ds.evaluate(results, print_summary=False)
    assert isinstance(ap, dict)


def _simulate_multiprocess_gather(monkeypatch, world, total, local_of_rank):
    """Run allgather_results under a mocked multi-process environment.

    Two passes per rank emulate the collective without threads: pass 1
    harvests what each rank CONTRIBUTES to every process_allgather call
    (the fake returns dummies, results discarded); pass 2 replays rank 0
    with a fake returning the true tiled concatenation over ranks, in the
    same deterministic call order every rank uses (idxs, then fields in
    sorted-key order).
    """
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: world)

    contributions = []           # [rank][call_index] -> array
    for rank in range(world):
        sent = []

        def harvest(x, tiled=True, _sent=sent):
            _sent.append(np.asarray(x))
            # dummy with the post-gather shape so pass 1 completes
            return np.concatenate([np.asarray(x)] * world)

        monkeypatch.setattr(multihost_utils, "process_allgather", harvest)
        allgather_results(dict(local_of_rank[rank]), total)
        contributions.append(sent)

    n_calls = len(contributions[0])
    assert all(len(c) == n_calls for c in contributions), (
        "ranks disagreed on the collective call sequence"
    )
    calls = iter(range(n_calls))

    def replay(x, tiled=True):
        i = next(calls)
        np.testing.assert_array_equal(np.asarray(x), contributions[0][i])
        return np.concatenate([c[i] for c in contributions])

    monkeypatch.setattr(multihost_utils, "process_allgather", replay)
    return allgather_results(dict(local_of_rank[0]), total)


def test_allgather_results_multiprocess_mock(monkeypatch):
    """Multi-host branch (pad-to-cap, -1 index sentinel, reassembly) is
    exact under mocked process_count/process_allgather, including ranks
    with fewer samples than the cap (total not divisible by world)."""
    world, total = 3, 7      # strided shards: 3 / 2 / 2 -> cap 3, pads 0/1/1
    rng = np.random.default_rng(0)
    golden = {
        i: {
            "boxes": rng.normal(size=(4, 8)).astype(np.float32),
            "valid": rng.integers(0, 2, size=(4,)).astype(bool),
        }
        for i in range(total)
    }
    local_of_rank = [
        {int(i): golden[int(i)]
         for i in dataset_shard(total, rank=r, world=world)}
        for r in range(world)
    ]
    out = _simulate_multiprocess_gather(
        monkeypatch, world, total, local_of_rank
    )
    assert len(out) == total
    for i in range(total):
        assert out[i] is not None, f"index {i} missing after gather"
        np.testing.assert_array_equal(out[i]["boxes"], golden[i]["boxes"])
        np.testing.assert_array_equal(out[i]["valid"], golden[i]["valid"])


def test_allgather_results_multiprocess_exact_division(monkeypatch):
    """No-padding path: every rank exactly at cap (total % world == 0)."""
    world, total = 4, 8
    golden = {
        i: {"a": np.full((2, 3), float(i), np.float32)} for i in range(total)
    }
    local_of_rank = [
        {int(i): golden[int(i)]
         for i in dataset_shard(total, rank=r, world=world)}
        for r in range(world)
    ]
    out = _simulate_multiprocess_gather(
        monkeypatch, world, total, local_of_rank
    )
    for i in range(total):
        np.testing.assert_array_equal(out[i]["a"], golden[i]["a"])
