"""Fast structural init (init_detector(fast=True)) vs the traced init.

The fast path must produce the exact same variable tree (structure,
shapes, dtypes) as flax's traced ``model.init`` while never compiling
the forward program, and must reproduce the model's initializer rules.
"""

import dataclasses

import jax
import numpy as np

from monorun_tpu.config import get_config
from monorun_tpu.models import init_detector


def _tiny_cfg():
    cfg = get_config("kitti_multiclass")
    return dataclasses.replace(
        cfg,
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depth=26),
        rpn=dataclasses.replace(cfg.rpn, nms_pre=8, nms_post=8,
                                feat_channels=32),
        neck=dataclasses.replace(cfg.neck, out_channels=32),
        bbox_head=dataclasses.replace(cfg.bbox_head, in_channels=32,
                                      fc_out_channels=64),
        global_head=dataclasses.replace(cfg.global_head, mc_samples=2,
                                        in_channels=32, fc_out_channels=64),
        noc_head=dataclasses.replace(
            cfg.noc_head, in_channels=32, conv_out_channels=32,
            carafe_compressed_channels=8, roi_size=8, dense_size=16,
        ),
        score_head=dataclasses.replace(
            cfg.score_head, reg_fc_out_channels=64, pose_fc_out_channels=64,
            fc_out_channels=32,
        ),
        test=dataclasses.replace(cfg.test, max_per_img=4, head_slots=0,
                                 rpn_nms_pre=8, rpn_nms_post=8),
        pose_head=dataclasses.replace(cfg.pose_head, ransac_hypotheses=2,
                                      lm_iters=2),
    )


def test_fast_init_matches_traced_structure():
    cfg = _tiny_cfg()
    rng = jax.random.PRNGKey(0)
    _, traced = init_detector(cfg, rng, (64, 128))
    _, fast = init_detector(cfg, rng, (64, 128), fast=True)

    t_flat = jax.tree_util.tree_flatten_with_path(traced)[0]
    f_flat = jax.tree_util.tree_flatten_with_path(fast)[0]
    assert len(t_flat) == len(f_flat)
    for (tp, tv), (fp, fv) in zip(t_flat, f_flat):
        assert tp == fp, (tp, fp)
        assert tv.shape == fv.shape, (tp, tv.shape, fv.shape)
        assert tv.dtype == fv.dtype, (tp, tv.dtype, fv.dtype)

    p = fast["params"]
    # initializer rules reproduced
    np.testing.assert_array_equal(
        np.asarray(p["noc_head"]["latent_decoder"]["kernel"]), 0.0
    )
    np.testing.assert_array_equal(np.asarray(p["cov_calib_logscale"]), 0.0)
    bs = fast["batch_stats"]
    leaf_paths = jax.tree_util.tree_flatten_with_path(bs)[0]
    for path, v in leaf_paths:
        names = [str(getattr(q, "key", q)) for q in path]
        expect = 1.0 if names[-1] == "var" else 0.0
        np.testing.assert_array_equal(np.asarray(v), expect)

    # a representative conv kernel has the lecun_normal scale
    k = np.asarray(p["backbone"]["conv1"]["kernel"])
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    assert abs(k.std() * np.sqrt(fan_in) - 1.0) < 0.15, k.std()
