"""End-to-end inference graph tests on a tiny config (CPU-friendly)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monorun_tpu.config import get_config
from monorun_tpu.models.detector import MonoRUn, init_detector


pytestmark = pytest.mark.heavy  # full-graph compile: run via -m heavy

def tiny_config():
    cfg = get_config("kitti_multiclass")
    cfg = dataclasses.replace(
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
    return cfg


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config()
    model, variables = init_detector(
        cfg, jax.random.PRNGKey(0), (64, 128)
    )
    return cfg, model, variables


def test_inference_shapes_and_finiteness(model_and_vars):
    cfg, model, variables = model_and_vars
    B, H, W = 2, 64, 128
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    K = jnp.asarray(
        np.tile(
            np.array([[70.0, 0, 64], [0, 70.0, 32], [0, 0, 1]], np.float32),
            (B, 1, 1),
        )
    )
    shapes = jnp.asarray([[60.0, 120.0], [64.0, 128.0]])
    det = model.apply(
        variables, images, K, shapes, jax.random.PRNGKey(1)
    )
    M = cfg.test.max_per_img
    assert det.bboxes_2d.shape == (B, M, 4)
    assert det.bboxes_3d.shape == (B, M, 8)
    assert det.labels.shape == (B, M)
    assert det.valid.shape == (B, M)
    assert det.pose_cov.shape == (B, M, 4, 4)
    assert np.isfinite(np.asarray(det.bboxes_3d)).all()
    assert np.isfinite(np.asarray(det.pose_cov)).all()
    # scores in [0, 1] (sigmoid x softmax products)
    s = np.asarray(det.bboxes_3d[..., 7])
    assert (s >= 0).all() and (s <= 1.5).all()


def test_inference_jits_and_is_deterministic(model_and_vars):
    cfg, model, variables = model_and_vars
    B, H, W = 1, 64, 128
    images = jnp.zeros((B, H, W, 3))
    K = jnp.asarray(
        np.array([[[70.0, 0, 64], [0, 70.0, 32], [0, 0, 1]]], np.float32)
    )
    shapes = jnp.asarray([[64.0, 128.0]])
    fn = jax.jit(
        lambda v, im, k, s, r: model.apply(v, im, k, s, r)
    )
    d1 = fn(variables, images, K, shapes, jax.random.PRNGKey(7))
    d2 = fn(variables, images, K, shapes, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(
        np.asarray(d1.bboxes_3d), np.asarray(d2.bboxes_3d)
    )


def test_param_count_plausible(model_and_vars):
    _, _, variables = model_and_vars
    n_params = sum(
        np.prod(p.shape) for p in jax.tree.leaves(variables["params"])
    )
    # ResNet-26 + FPN + heads (depth-50 init is covered by
    # tests/test_checkpoint.py); heads alone are ~25M
    assert 15e6 < n_params < 90e6, n_params


def test_serve_raw_matches_f32_path(model_and_vars):
    """The uint8-canvas serving program (serve_raw: on-device
    preprocessing fused in front, reference apis/inference.py:51-75) must
    reproduce the f32-input program exactly at test_scale=1."""
    cfg, model, variables = model_and_vars
    cfg2 = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, pad_height=64, pad_width=128,
            raw_height=64, raw_width=128,
        ),
    )
    from monorun_tpu.data.pipeline import device_preprocess
    from monorun_tpu.models import MonoRUn

    model2 = MonoRUn(cfg2)
    B = 2
    rng = np.random.default_rng(3)
    raw = jnp.asarray(rng.integers(0, 256, (B, 64, 128, 3), np.uint8))
    native = jnp.asarray([[60.0, 120.0], [64.0, 128.0]])
    K = jnp.asarray(
        np.tile(
            np.array([[70.0, 0, 64], [0, 70.0, 32], [0, 0, 1]], np.float32),
            (B, 1, 1),
        )
    )
    det_raw = model2.apply(
        variables, raw, K, native, jax.random.PRNGKey(1),
        method=model2.serve_raw,
    )
    imgs, shp = device_preprocess(raw, native, cfg2.data)
    det_f32 = model2.apply(
        variables, imgs, K, shp, jax.random.PRNGKey(1)
    )
    np.testing.assert_array_equal(
        np.asarray(det_raw.bboxes_3d), np.asarray(det_f32.bboxes_3d)
    )
    np.testing.assert_array_equal(
        np.asarray(det_raw.valid), np.asarray(det_f32.valid)
    )
