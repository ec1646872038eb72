"""Fast-preset plumbing: test-time downscale + proposal cut.

The kitti_multiclass_fast preset is an architectural FLOP cut (0.75x
input, 512 proposals) the reference does not make; these tests pin the
coordinate bookkeeping — image and intrinsics scale together, predicted
2D boxes map back to native coords — so the cut only ever costs AP
through the model, never through the plumbing.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from monorun_tpu.config import get_config
from monorun_tpu.data.kitti import KITTI3DDataset
from monorun_tpu.data.pipeline import prepare_test_sample

pytestmark = pytest.mark.smoke  # seconds-fast numeric core


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti") / "training"
    for sub in ("image_2", "calib", "label_2"):
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids = ["000000", "000001"]
    (root / "val.txt").write_text("\n".join(ids) + "\n")
    for i in ids:
        img = rng.integers(0, 255, (375, 1242, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "image_2" / f"{i}.png"), img)
        (root / "calib" / f"{i}.txt").write_text(
            "P0: " + " ".join(["0"] * 12) + "\n"
            "P1: " + " ".join(["0"] * 12) + "\n"
            "P2: 721.5 0.0 609.6 44.9 0.0 721.5 172.9 0.1 0.0 0.0 1.0 0.003\n"
        )
        (root / "label_2" / f"{i}.txt").write_text(
            "Car 0.0 0 1.2 80.0 40.0 140.0 90.0 1.5 1.7 4.0 "
            "0.5 1.6 12.0 1.3\n"
        )
    return str(root) + os.sep


def test_fast_preset_shapes():
    cfg = get_config("kitti_multiclass_fast")
    assert cfg.data.test_scale == 0.75
    assert cfg.data.pad_height % 64 == 0 and cfg.data.pad_width % 64 == 0
    assert cfg.test.rpn_nms_post == 512
    # scaled KITTI max size must fit the pads
    assert 376 * 0.75 <= cfg.data.pad_height
    assert 1242 * 0.75 <= cfg.data.pad_width


def test_prepare_test_sample_scales_image_and_intrinsics(kitti_dir):
    cfg = get_config("kitti_multiclass_fast")
    ds = KITTI3DDataset(kitti_dir, "val.txt", classes=cfg.data.classes)
    s = prepare_test_sample(ds, 0, cfg.data)
    assert s["images"].shape == (cfg.data.pad_height, cfg.data.pad_width, 3)
    rh, rw = s["img_shapes"]
    assert (rh, rw) == (round(375 * 0.75), round(1242 * 0.75))
    native = ds.get_ann(0)["cam_intrinsic"]
    np.testing.assert_allclose(s["cam"][:2], native[:2] * 0.75, rtol=1e-6)
    np.testing.assert_allclose(s["cam"][2], native[2])
    # a metric point projects to 0.75x the native pixel coordinates
    p = np.array([2.0, 1.0, 15.0])
    uv = lambda K: (K @ p)[:2] / (K @ p)[2]
    np.testing.assert_allclose(uv(s["cam"]), uv(native) * 0.75, rtol=1e-6)


def test_run_eval_maps_boxes_back_to_native(kitti_dir):
    from monorun_tpu.apis.test import run_eval
    from monorun_tpu.models.detector import Detections

    cfg = get_config("kitti_multiclass_fast")
    ds = KITTI3DDataset(
        kitti_dir, "val.txt", classes=cfg.data.classes, with_labels=True
    )
    captured = {}

    class StubSession:
        pass

    session = StubSession()
    session.cfg = cfg

    def run(images, cam, shapes, seed=0):
        captured["shapes"] = np.asarray(shapes)
        B, M = images.shape[0], 2
        b3 = np.zeros((B, M, 8), np.float32)
        b3[..., :3] = [4.0, 1.5, 1.7]
        b3[..., 4] = 1.6
        b3[..., 5] = 15.0
        b3[..., 7] = 0.8
        return Detections(
            bboxes_2d=np.tile(
                np.array([60.0, 30.0, 105.0, 67.5], np.float32), (B, M, 1)
            ),
            scores_2d=np.full((B, M), 0.8, np.float32),
            labels=np.zeros((B, M), np.int64),
            bboxes_3d=b3,
            valid=np.ones((B, M), bool),
            pose_cov=np.tile(
                np.eye(4, dtype=np.float32) * 0.1, (B, M, 1, 1)
            ),
            extras={},
        )

    session.run = run
    result_dir = os.path.join(kitti_dir, "..", "results")
    run_eval(
        session, ds, batch_size=2, print_summary=False, progress=False,
        result_dir=result_dir,
    )
    # the loader fed 0.75x shapes to the model
    np.testing.assert_allclose(
        captured["shapes"][0], [round(375 * 0.75), round(1242 * 0.75)]
    )
    # the submission file carries NATIVE-coordinate 2D boxes (4/3x)
    line = open(os.path.join(result_dir, "000000.txt")).readline().split()
    bbox = np.asarray(line[4:8], np.float32)
    np.testing.assert_allclose(bbox, [80.0, 40.0, 140.0, 90.0], atol=1e-3)


def test_fast2_preset_shapes():
    """fast2 rung: 256 proposals, 24 head slots, 16 MC samples, 14x14
    dense maps (no CARAFE). The NOC head must emit roi-grid-sized maps
    and the config must stay internally consistent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from monorun_tpu.config import get_config
    from monorun_tpu.models.noc_head import NOCHead

    cfg = get_config("kitti_multiclass_fast2")
    assert cfg.test.rpn_nms_post == 256
    assert cfg.test.head_slots == 24
    assert cfg.global_head.mc_samples == 16
    assert cfg.noc_head.dense_size == cfg.noc_head.roi_size == 14
    assert cfg.train.dense_size == 14
    assert get_config("kitti_multiclass_fast2_r50").backbone.depth == 50

    nh = NOCHead(cfg.noc_head, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 14, 14, 256)).astype(
            np.float32
        )
    )
    lat = jnp.zeros((4, cfg.noc_head.latent_channels), jnp.float32)
    lbl = jnp.asarray([0, 1, 2, 0], jnp.int32)
    flp = jnp.zeros((4,), bool)
    v = nh.init(jax.random.PRNGKey(0), x, lat, lbl, flp, False)
    out = nh.apply(v, x, lat, lbl, flp, False)
    assert out.noc_pred.shape == (4, 14, 14, 3)
    assert out.proj_logstd.shape == (4, 14, 14, 2)
    # no CARAFE/post-conv params exist in this configuration
    assert "upsample" not in v["params"]
    assert not any(k.startswith("conv_up") for k in v["params"])
