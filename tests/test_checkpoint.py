"""Checkpoint converter tests with a synthetic reference-style state dict."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from monorun_tpu.config import get_config
from monorun_tpu.models import init_detector
from monorun_tpu.utils.checkpoint import (
    convert_torch_checkpoint,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def tiny_cfg():
    cfg = get_config("kitti_multiclass")
    return dataclasses.replace(
        cfg,
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depth=50),
    )


@pytest.fixture(scope="module")
def variables():
    cfg = tiny_cfg()
    _, v = init_detector(cfg, jax.random.PRNGKey(0), (64, 128))
    return jax.tree.map(np.asarray, v)


def _fake_torch_sd(variables):
    """Build a torch-style state dict matching reference key names from
    our param shapes (inverting the converter's layout rules)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    sd = {}

    def conv_t(k):  # HWIO -> OIHW
        return torch.tensor(np.transpose(k, (3, 2, 0, 1)))

    def fc_t(k):
        return torch.tensor(np.transpose(k, (1, 0)))

    sd["backbone.conv1.weight"] = conv_t(p["backbone"]["conv1"]["kernel"])
    for nm, ours in (("weight", "scale"), ("bias", "bias")):
        sd[f"backbone.bn1.{nm}"] = torch.tensor(p["backbone"]["bn1"][ours])
    sd["backbone.bn1.running_mean"] = torch.tensor(
        bs["backbone"]["bn1"]["mean"])
    sd["backbone.bn1.running_var"] = torch.tensor(bs["backbone"]["bn1"]["var"])
    sd["backbone.bn1.num_batches_tracked"] = torch.tensor(0)

    sd["backbone.layer2.0.conv1.weight"] = conv_t(
        p["backbone"]["layer2_0"]["conv1"]["kernel"])
    sd["backbone.layer2.0.downsample.0.weight"] = conv_t(
        p["backbone"]["layer2_0"]["downsample_conv"]["kernel"])
    sd["backbone.layer2.0.downsample.1.weight"] = torch.tensor(
        p["backbone"]["layer2_0"]["downsample_bn"]["scale"])

    sd["neck.lateral_convs.0.conv.weight"] = conv_t(
        p["neck"]["lateral0"]["kernel"])
    sd["neck.lateral_convs.0.conv.bias"] = torch.tensor(
        p["neck"]["lateral0"]["bias"])
    sd["neck.lower_fpn_convs.0.conv.weight"] = conv_t(
        p["neck"]["lower0"]["kernel"])

    sd["rpn_head.rpn_cls.weight"] = conv_t(p["rpn_head"]["rpn_cls"]["kernel"])
    sd["roi_head.bbox_head.shared_fcs.0.weight"] = fc_t(
        p["bbox_head"]["shared_fc0"]["kernel"])
    sd["roi_head.global_head.fcs.0.weight"] = fc_t(
        p["global_head"]["fc0_kernel"])
    sd["roi_head.global_head.fcs.0.bias"] = torch.tensor(
        p["global_head"]["fc0_bias"])
    sd["roi_head.noc_head.upsample.content_encoder.weight"] = conv_t(
        p["noc_head"]["upsample"]["content_encoder"]["kernel"])
    sd["roi_head.score_head.pose_norm.running_mean"] = torch.tensor(
        bs["score_head"]["pose_norm"]["mean"])
    sd["roi_head.pose_head.cov_calib_logscale"] = torch.tensor(
        p["cov_calib_logscale"])
    sd["roi_head.projection_head.loss_proj.mean_inv_std"] = torch.tensor(2.5)
    return sd


def test_convert_places_all_keys(tmp_path, variables):
    sd = _fake_torch_sd(variables)
    pth = tmp_path / "ref.pth"
    torch.save({"state_dict": sd}, pth)
    params, batch_stats, loss_ema, report = convert_torch_checkpoint(
        str(pth), variables["params"], variables["batch_stats"]
    )
    bad = {k: v for k, v in report.items() if v != "ok"}
    assert not bad, bad
    assert loss_ema == 2.5
    # round-trip identity: values placed back equal the originals
    np.testing.assert_allclose(
        params["backbone"]["conv1"]["kernel"],
        variables["params"]["backbone"]["conv1"]["kernel"],
    )
    np.testing.assert_allclose(
        params["global_head"]["fc0_kernel"],
        variables["params"]["global_head"]["fc0_kernel"],
    )
    np.testing.assert_allclose(
        batch_stats["score_head"]["pose_norm"]["mean"],
        variables["batch_stats"]["score_head"]["pose_norm"]["mean"],
    )


def test_convert_reports_shape_mismatch(tmp_path, variables):
    sd = {"backbone.conv1.weight": torch.zeros(64, 3, 5, 5)}  # wrong k size
    pth = tmp_path / "bad.pth"
    torch.save({"state_dict": sd}, pth)
    _, _, _, report = convert_torch_checkpoint(
        str(pth), variables["params"], variables["batch_stats"]
    )
    assert report["backbone.conv1.weight"].startswith("shape-mismatch")


def test_orbax_roundtrip(tmp_path, variables):
    state = {
        "params": {"w": np.arange(6, np.float32).reshape(2, 3)
                   if False else np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": np.asarray(7),
    }
    path = save_checkpoint(str(tmp_path / "ckpt"), state, 7)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path
    restored = load_checkpoint(path, state)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert int(restored["step"]) == 7
