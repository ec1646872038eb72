"""Activation parity against verbatim torch replicas of the reference heads.

The replicas in tests/torch_ref mirror the reference modules' math and
state-dict key layout (fc_extractor.py, fcn_noc_decoder.py:190-267,
mlp_score_head.py:94-185, mmcv RoIAlign/CARAFE). Each test exports a torch
state dict under the reference's full key names, routes it through
``convert_torch_checkpoint``, and asserts per-layer activation parity in
fp32 — so a wrong converter regex, flatten order, channel-bank layout, or
sampling convention fails loudly.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from monorun_tpu.config import (
    GlobalHeadConfig,
    NOCHeadConfig,
    ScoreHeadConfig,
)
from monorun_tpu.models.global_head import GlobalHead
from monorun_tpu.models.noc_head import NOCHead
from monorun_tpu.models.score_head import ScoreHead
from monorun_tpu.ops.carafe import CARAFEPack
from monorun_tpu.ops.roi_align import roi_align
from monorun_tpu.utils.checkpoint import convert_torch_checkpoint

from torch_ref.heads import (
    FCExtractorTorch,
    FCNNOCDecoderTorch,
    MLPScoreHeadTorch,
)
from torch_ref.ops import CARAFEPackTorch, roi_align_torch

RTOL, ATOL = 1e-4, 1e-4


def _save_sd(tmp_path, sd, name="ref.pth"):
    p = str(tmp_path / name)
    torch.save({"state_dict": sd}, p)
    return p


def _nchw(x_nhwc):
    return torch.tensor(np.moveaxis(np.asarray(x_nhwc), -1, 1).copy())


def _to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


# ---------------------------------------------------------------- RoIAlign


def test_roi_align_matches_mmcv_semantics():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 24, 32, 5)).astype(np.float32)
    rois = np.asarray(
        [
            # [batch, x1, y1, x2, y2] in feature coords (scale 1)
            [0, 2.3, 3.1, 20.7, 18.2],      # grid ceil(15/7)=3 x ceil(18/7)=3
            [0, 0.0, 0.0, 6.9, 6.9],        # tiny, grid 1
            [1, -2.0, -1.5, 10.0, 26.0],    # crosses the top/left border
            [1, 25.0, 15.0, 38.0, 30.0],    # crosses the bottom/right border
            [0, 5.0, 5.0, 5.4, 5.4],        # sub-pixel roi
        ],
        np.float32,
    )
    for out_size in [(7, 7), (14, 14)]:
        ours = roi_align(
            jnp.asarray(feats), jnp.asarray(rois), out_size,
            spatial_scale=1.0, sampling_ratio=0, max_ratio=4, aligned=True,
        )
        ref = roi_align_torch(
            _nchw(feats), torch.tensor(rois), out_size,
            spatial_scale=1.0, sampling_ratio=0, aligned=True,
        )
        np.testing.assert_allclose(
            np.asarray(ours), _to_nhwc(ref), rtol=RTOL, atol=ATOL,
        )


def test_roi_align_spatial_scale():
    """Image-coord rois on a stride-4 feature map (spatial_scale=0.25)."""
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(1, 16, 20, 3)).astype(np.float32)
    rois = np.asarray(
        [[0, 8.0, 4.0, 72.0, 56.0], [0, 30.0, 10.0, 46.0, 26.0]], np.float32
    )
    ours = roi_align(
        jnp.asarray(feats), jnp.asarray(rois), (7, 7),
        spatial_scale=0.25, sampling_ratio=0, max_ratio=4, aligned=True,
    )
    ref = roi_align_torch(
        _nchw(feats), torch.tensor(rois), (7, 7),
        spatial_scale=0.25, sampling_ratio=0, aligned=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours), _to_nhwc(ref), rtol=RTOL, atol=ATOL
    )


# ---------------------------------------------------------------- CARAFE


def test_carafe_matches_mmcv_semantics():
    torch.manual_seed(2)
    tm = CARAFEPackTorch(
        channels=6, scale_factor=2, up_kernel=5, encoder_kernel=3,
        compressed_channels=4,
    ).eval()
    x = torch.randn(2, 6, 5, 7)
    with torch.no_grad():
        ref = tm(x)

    model = CARAFEPack(
        channels=6, scale=2, up_kernel=5, encoder_kernel=3,
        compressed_channels=4,
    )
    x_j = jnp.asarray(np.moveaxis(x.numpy(), 1, -1))
    variables = model.init(jax.random.PRNGKey(0), x_j)
    p = jax.tree.map(np.asarray, variables["params"])
    sd = tm.state_dict()
    p["channel_compressor"]["kernel"] = np.transpose(
        sd["channel_compressor.weight"].numpy(), (2, 3, 1, 0)
    )
    p["channel_compressor"]["bias"] = sd["channel_compressor.bias"].numpy()
    p["content_encoder"]["kernel"] = np.transpose(
        sd["content_encoder.weight"].numpy(), (2, 3, 1, 0)
    )
    p["content_encoder"]["bias"] = sd["content_encoder.bias"].numpy()
    ours = model.apply({"params": p}, x_j)
    np.testing.assert_allclose(
        np.asarray(ours), _to_nhwc(ref), rtol=RTOL, atol=ATOL
    )


# ---------------------------------------------------------------- heads


def test_global_head_parity_via_converter(tmp_path):
    cfg = GlobalHeadConfig(
        in_channels=16, fc_out_channels=32, latent_channels=4,
        num_classes=3, dropout_rate=0.0, dropout2d_rate=0.0, mc_samples=3,
    )
    model = GlobalHead(cfg)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(5, 7, 7, 16)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), x, True, jax.random.PRNGKey(1)
    )

    torch.manual_seed(3)
    tm = FCExtractorTorch(
        num_fcs=2, in_channels=16, fc_out_channels=32, num_classes=3,
        roi_feat_size=7, latent_channels=4,
    ).eval()
    sd = {f"roi_head.global_head.{k}": v for k, v in tm.state_dict().items()}
    pth = _save_sd(tmp_path, sd)
    params, _, _, report = convert_torch_checkpoint(
        pth, {"global_head": variables["params"]}, {}
    )
    assert all(v == "ok" for v in report.values()), report

    out = model.apply(
        {"params": params["global_head"]}, x, True, jax.random.PRNGKey(2)
    )
    with torch.no_grad():
        dim_t, fc_t = tm(_nchw(x))
    np.testing.assert_allclose(
        np.asarray(out.dim_latent_pred), dim_t.numpy(), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(out.reg_fc_out), fc_t.numpy(), rtol=RTOL, atol=ATOL
    )

    # with zero dropout the factored-MC path must equal the deterministic
    # forward with zero variance
    mc = model.apply(
        {"params": params["global_head"]}, x, False, jax.random.PRNGKey(4)
    )
    np.testing.assert_allclose(
        np.asarray(mc.dim_latent_pred), dim_t.numpy(), rtol=1e-3, atol=1e-3
    )
    assert float(jnp.max(jnp.abs(mc.dim_latent_var))) < 1e-6


def test_noc_head_parity_via_converter(tmp_path):
    cfg = NOCHeadConfig(
        num_convs=3, in_channels=8, conv_out_channels=8, num_classes=3,
        latent_channels=4, carafe_compressed_channels=4,
        dropout2d_rate=0.0,
    )
    model = NOCHead(cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 6, 6, 8)).astype(np.float32))
    latent = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 0])
    flip = jnp.asarray([False, True, False, True])
    variables = model.init(
        jax.random.PRNGKey(0), x, latent, labels, flip, False
    )

    torch.manual_seed(4)
    tm = FCNNOCDecoderTorch(
        num_convs=3, in_channels=8, conv_out_channels=8, num_classes=3,
        latent_channels=4, compressed_channels=4,
    ).eval()
    sd = {f"roi_head.noc_head.{k}": v for k, v in tm.state_dict().items()}
    pth = _save_sd(tmp_path, sd)
    params, _, _, report = convert_torch_checkpoint(
        pth, {"noc_head": variables["params"]}, {}
    )
    assert all(v == "ok" for v in report.values()), report

    out = model.apply(
        {"params": params["noc_head"]}, x, latent, labels, flip, False
    )
    with torch.no_grad():
        noc_t, logstd_t = tm(
            _nchw(x), torch.tensor(np.asarray(latent)),
            torch.tensor(np.asarray(labels)),
            [bool(f) for f in np.asarray(flip)],
        )
    np.testing.assert_allclose(
        np.asarray(out.noc_pred), _to_nhwc(noc_t), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(out.proj_logstd), _to_nhwc(logstd_t), rtol=RTOL, atol=ATOL
    )


def test_score_head_parity_via_converter(tmp_path):
    cfg = ScoreHeadConfig(
        reg_fc_out_channels=16, pose_fc_out_channels=16, fc_out_channels=8
    )
    model = ScoreHead(cfg)
    rng = np.random.default_rng(5)
    reg_fc = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))
    yaw = jnp.asarray(rng.normal(size=(5, 1)).astype(np.float32))
    t_vec = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    a = rng.normal(size=(5, 4, 4)).astype(np.float32)
    cov = jnp.asarray(a @ np.transpose(a, (0, 2, 1)))
    dims = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), reg_fc, yaw, t_vec, cov, dims, False
    )

    torch.manual_seed(5)
    tm = MLPScoreHeadTorch(
        reg_fc_out_channels=16, pose_fc_out_channels=16, fc_out_channels=8
    ).eval()
    with torch.no_grad():
        # non-trivial running stats so the batch_stats conversion is tested
        tm.pose_norm.running_mean.normal_()
        tm.pose_norm.running_var.uniform_(0.5, 2.0)
        tm.pose_norm.weight.normal_()
        tm.pose_norm.bias.normal_()
    sd = {f"roi_head.score_head.{k}": v for k, v in tm.state_dict().items()}
    pth = _save_sd(tmp_path, sd)
    params, bstats, _, report = convert_torch_checkpoint(
        pth,
        {"score_head": variables["params"]},
        {"score_head": variables["batch_stats"]},
    )
    assert all(v == "ok" for v in report.values()), report

    logits = model.apply(
        {"params": params["score_head"], "batch_stats": bstats["score_head"]},
        reg_fc, yaw, t_vec, cov, dims, False,
    )
    with torch.no_grad():
        ref = tm(
            torch.tensor(np.asarray(reg_fc)), torch.tensor(np.asarray(yaw)),
            torch.tensor(np.asarray(t_vec)), torch.tensor(np.asarray(cov)),
            torch.tensor(np.asarray(dims)),
        )
    np.testing.assert_allclose(
        np.asarray(logits), ref.numpy(), rtol=RTOL, atol=ATOL
    )


# ------------------------------------------------- converter key coverage


def _reference_checkpoint_keys():
    """The complete key space of a released MonoRUn checkpoint, derived
    from the reference model definition (configs/kitti_multiclass.py:1-115,
    fpn_plus.py, the head sources) — mmdet ResNet-101 + FPNplus + RPNHead +
    Shared2FCBBoxHead + the four 3D heads + the stateful loss buffers."""
    keys = []
    bn = ["weight", "bias", "running_mean", "running_var",
          "num_batches_tracked"]

    def add_bn(prefix):
        keys.extend(f"{prefix}.{s}" for s in bn)

    # backbone: torchvision-style ResNet-101
    keys.append("backbone.conv1.weight")
    add_bn("backbone.bn1")
    blocks = {1: 3, 2: 4, 3: 23, 4: 3}
    for layer, n in blocks.items():
        for b in range(n):
            for c in (1, 2, 3):
                keys.append(f"backbone.layer{layer}.{b}.conv{c}.weight")
                add_bn(f"backbone.layer{layer}.{b}.bn{c}")
            if b == 0:
                keys.append(
                    f"backbone.layer{layer}.{b}.downsample.0.weight"
                )
                add_bn(f"backbone.layer{layer}.{b}.downsample.1")
    # neck: FPNplus (lateral 0-3, fpn 0-3, lower 0); extra P6 is maxpool
    for i in range(4):
        keys += [f"neck.lateral_convs.{i}.conv.weight",
                 f"neck.lateral_convs.{i}.conv.bias",
                 f"neck.fpn_convs.{i}.conv.weight",
                 f"neck.fpn_convs.{i}.conv.bias"]
    keys += ["neck.lower_fpn_convs.0.conv.weight",
             "neck.lower_fpn_convs.0.conv.bias"]
    # rpn
    for m in ("rpn_conv", "rpn_cls", "rpn_reg"):
        keys += [f"rpn_head.{m}.weight", f"rpn_head.{m}.bias"]
    # bbox head (Shared2FCBBoxHead)
    for i in range(2):
        keys += [f"roi_head.bbox_head.shared_fcs.{i}.weight",
                 f"roi_head.bbox_head.shared_fcs.{i}.bias"]
    for m in ("fc_cls", "fc_reg"):
        keys += [f"roi_head.bbox_head.{m}.weight",
                 f"roi_head.bbox_head.{m}.bias"]
    # global head
    for i in range(2):
        keys += [f"roi_head.global_head.fcs.{i}.weight",
                 f"roi_head.global_head.fcs.{i}.bias"]
    keys += ["roi_head.global_head.fc_reg.weight",
             "roi_head.global_head.fc_reg.bias"]
    # noc head
    for i in range(3):
        keys += [f"roi_head.noc_head.convs.{i}.conv.weight",
                 f"roi_head.noc_head.convs.{i}.conv.bias"]
    keys += [
        "roi_head.noc_head.latent_decoder.weight",
        "roi_head.noc_head.latent_decoder.bias",
        "roi_head.noc_head.upsample.channel_compressor.weight",
        "roi_head.noc_head.upsample.channel_compressor.bias",
        "roi_head.noc_head.upsample.content_encoder.weight",
        "roi_head.noc_head.upsample.content_encoder.bias",
        "roi_head.noc_head.convs_upsampled.0.conv.weight",
        "roi_head.noc_head.convs_upsampled.0.conv.bias",
        "roi_head.noc_head.conv_final.weight",
        "roi_head.noc_head.conv_final.bias",
    ]
    # score head
    add_bn("roi_head.score_head.pose_norm")
    for m in ("pose_fcs.0", "fused_fcs.0", "fc_out"):
        keys += [f"roi_head.score_head.{m}.weight",
                 f"roi_head.score_head.{m}.bias"]
    # stateful buffers
    keys += [
        "roi_head.pose_head.cov_calib_logscale",
        "roi_head.projection_head.loss_proj.mean_inv_std",
    ]
    return keys


def test_converter_covers_full_reference_key_space():
    from monorun_tpu.utils.checkpoint import _torch_key_map

    unmapped = []
    for k in _reference_checkpoint_keys():
        mapped = _torch_key_map(k)
        if mapped is None:
            assert k.endswith("num_batches_tracked"), k
            continue
        path, _ = mapped
        if path[0] == "__unmapped__":
            unmapped.append(k)
    assert not unmapped, unmapped
