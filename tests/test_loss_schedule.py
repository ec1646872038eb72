"""Generic scheduled config swaps (LossUpdaterHook equivalent).

The reference swaps loss modules by dotted attr path on a step schedule
(runner/hooks/loss_updater.py:17-57, configs/kitti_multiclass.py:315-325).
Here the schedule rewrites the frozen config and the train loop
re-specialises the jitted step at each boundary.
"""

import dataclasses

from monorun_tpu.config import (
    LossScheduleEntry,
    apply_loss_schedule,
    get_config,
    schedule_boundaries,
    set_by_path,
)


def test_default_preset_encodes_loss_calib_schedule():
    cfg = get_config("kitti_multiclass")
    # before iteration 100 the calib loss has zero weight
    assert cfg.pose_head.loss_calib_weight == 0.0
    assert apply_loss_schedule(cfg, 99).pose_head.loss_calib_weight == 0.0
    # from iteration 100 on, weight 0.01 (reference LossUpdaterHook cfg)
    assert apply_loss_schedule(cfg, 100).pose_head.loss_calib_weight == 0.01
    assert schedule_boundaries(cfg) == (100,)


def test_set_by_path_nested_and_toplevel():
    cfg = get_config("kitti_multiclass")
    cfg2 = set_by_path(cfg, "pose_head.lm_iters", 3)
    assert cfg2.pose_head.lm_iters == 3
    assert cfg.pose_head.lm_iters != 3   # original untouched
    cfg3 = set_by_path(cfg, "compute_dtype", "float32")
    assert cfg3.compute_dtype == "float32"


def test_multi_entry_schedule_from_config_alone():
    """A second scheduled swap (arbitrary dotted path) works from config
    alone — the capability the hard-coded gate lacked."""
    cfg = get_config("kitti_multiclass")
    cfg = dataclasses.replace(
        cfg,
        loss_schedule=(
            LossScheduleEntry(100, "pose_head.loss_calib_weight", 0.01),
            LossScheduleEntry(50, "projection_head.loss_weight", 0.5),
            LossScheduleEntry(200, "projection_head.loss_weight", 0.25),
        ),
    )
    assert schedule_boundaries(cfg) == (50, 100, 200)

    c0 = apply_loss_schedule(cfg, 0)
    assert c0.projection_head.loss_weight == 1.0
    assert c0.pose_head.loss_calib_weight == 0.0

    c60 = apply_loss_schedule(cfg, 60)
    assert c60.projection_head.loss_weight == 0.5
    assert c60.pose_head.loss_calib_weight == 0.0

    c150 = apply_loss_schedule(cfg, 150)
    assert c150.projection_head.loss_weight == 0.5
    assert c150.pose_head.loss_calib_weight == 0.01

    # later entries override earlier ones on the same path
    c300 = apply_loss_schedule(cfg, 300)
    assert c300.projection_head.loss_weight == 0.25
