"""Full-detector golden parity: torch torso replica vs the jax detector.

The per-module parity tests (tests/test_torch_parity.py) pin each head in
isolation; this closes the remaining gap the reference's released
checkpoints would expose — a silent layout/ordering skew in the COMPOSED
backbone -> FPNplus -> RPN -> RoIAlign -> bbox-head pipeline after the
.pth converter. A plain-torch replica of that torso (tests/torch_ref/
backbone.py, reference state-dict key names) is initialized with random
weights AND non-trivial BN running stats, exported as a .pth, converted
with convert_torch_checkpoint, and both stacks run one fixture image with
stage-by-stage activation asserts at flagship channel widths (256-channel
neck, 1024-d FCs; depth-50 backbone, dense stride-2 level — the .pth-load
default).

PnP/NMS are excluded on purpose: they have their own exact oracles
(tests/test_pnp.py vs cv2, tests/test_nms.py vs greedy golden), and the
3D heads have converter-parity tests of their own.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from monorun_tpu.config import get_config
from monorun_tpu.models import init_detector
from monorun_tpu.ops.roi_align import multilevel_roi_align
from monorun_tpu.utils.checkpoint import convert_torch_checkpoint

from torch_ref.backbone import DetectorTorso
from torch_ref.ops import roi_align_torch

pytestmark = pytest.mark.heavy   # flagship-width graphs on a 1-core CPU

H, W = 128, 256
DEPTH = 50
STRIDES = (2, 4, 8, 16, 32)
FINEST = 20.0

# RoIs covering every extractor level (areas straddle the mmdet level
# thresholds scale = finest * 2^l): tiny -> stride-2 ... large -> stride-32
ROIS = np.asarray(
    [
        [0, 30.0, 40.0, 55.0, 58.0],       # scale ~21  -> level 0
        [0, 100.0, 20.0, 160.0, 55.0],     # scale ~46  -> level 1
        [0, 8.0, 8.0, 120.0, 90.0],        # scale ~96  -> level 2
        [0, 4.0, 4.0, 250.0, 120.0],       # scale ~169 -> level 3
        [0, 48.25, 30.5, 90.75, 101.25],   # fractional coords, tall
        [0, 140.0, 60.0, 252.0, 126.0],    # wide, near the border
    ],
    np.float32,
)


def _rescale_torso(torso: DetectorTorso, rng: np.random.Generator):
    """Random weights that keep depth-50 activations bounded, plus
    NON-TRIVIAL BN buffers so the converter's bn mapping has real effect."""
    for m in torso.modules():
        if isinstance(m, torch.nn.Conv2d):
            fan_in = m.in_channels * m.kernel_size[0] * m.kernel_size[1]
            m.weight.data = torch.from_numpy(
                rng.normal(0, 1.0 / np.sqrt(fan_in),
                           m.weight.shape).astype(np.float32)
            )
            if m.bias is not None:
                m.bias.data = torch.from_numpy(
                    rng.normal(0, 0.02, m.bias.shape).astype(np.float32)
                )
        elif isinstance(m, torch.nn.Linear):
            m.weight.data = torch.from_numpy(
                rng.normal(0, 1.0 / np.sqrt(m.in_features),
                           m.weight.shape).astype(np.float32)
            )
            m.bias.data = torch.from_numpy(
                rng.normal(0, 0.02, m.bias.shape).astype(np.float32)
            )
        elif isinstance(m, torch.nn.BatchNorm2d):
            n = m.num_features
            m.weight.data = torch.from_numpy(
                rng.uniform(0.8, 1.2, n).astype(np.float32))
            m.bias.data = torch.from_numpy(
                rng.normal(0, 0.05, n).astype(np.float32))
            m.running_mean.data = torch.from_numpy(
                rng.normal(0, 0.05, n).astype(np.float32))
            m.running_var.data = torch.from_numpy(
                rng.uniform(0.7, 1.3, n).astype(np.float32))


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    cfg = get_config("kitti_multiclass")
    cfg = dataclasses.replace(
        cfg,
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depth=DEPTH),
        neck=dataclasses.replace(cfg.neck, lazy_lower=False),
    )
    rng = np.random.default_rng(11)
    torso = DetectorTorso(depth=DEPTH)
    _rescale_torso(torso, rng)
    pth = str(tmp_path_factory.mktemp("golden") / "torso.pth")
    torch.save({"state_dict": torso.state_dict()}, pth)

    model, variables = init_detector(cfg, jax.random.PRNGKey(0), (H, W),
                                     fast=True)
    params, batch_stats, _, report = convert_torch_checkpoint(
        pth, variables["params"], variables["batch_stats"]
    )
    bad = {k: v for k, v in report.items() if v != "ok"}
    assert not bad, bad   # every replica key must land in the jax tree
    variables = {"params": params, "batch_stats": batch_stats}

    img = rng.normal(0, 1, (1, H, W, 3)).astype(np.float32)
    return cfg, model, variables, torso, img


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def _assert_close(a, b, label, rtol=2e-3):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = max(float(np.std(b)), 1e-6)
    np.testing.assert_allclose(
        a, b, atol=rtol * scale, rtol=rtol,
        err_msg=f"stage {label} diverged (scale {scale:.4f})",
    )


def test_composed_torso_stage_parity(stacks):
    cfg, model, variables, torso, img = stacks

    t_feats, t_fpn, t_cls, t_reg = torso.stages(
        torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    )

    def fwd(m, x):
        feats = m.backbone(x)
        fpn = m.neck(feats)
        cls_scores, bbox_preds = m.run_rpn(fpn)
        return feats, fpn, cls_scores, bbox_preds

    j_feats, j_fpn, j_cls, j_reg = jax.jit(
        lambda v, x: model.apply(v, x, method=fwd)
    )(variables, jnp.asarray(img))

    # backbone C2..C5 (space-to-depth stem must be exact vs 7x7/s2)
    for i, (a, b) in enumerate(zip(j_feats, t_feats)):
        _assert_close(a, _nhwc(b), f"backbone C{i + 2}")
    # FPNplus P1(stride2, dense)..P6
    for i, (a, b) in enumerate(zip(j_fpn, t_fpn)):
        _assert_close(a, _nhwc(b), f"fpn out {i} (stride {2 ** (i + 1)})")
    # RPN heads on levels 1..5
    for i, (a, b) in enumerate(zip(j_cls, t_cls)):
        _assert_close(a, _nhwc(b), f"rpn cls lvl {i}")
    for i, (a, b) in enumerate(zip(j_reg, t_reg)):
        _assert_close(a, _nhwc(b), f"rpn reg lvl {i}")


def test_composed_roialign_bboxhead_parity(stacks):
    cfg, model, variables, torso, img = stacks

    _, t_fpn, _, _ = torso.stages(
        torch.from_numpy(np.moveaxis(img, -1, 1).copy())
    )
    # torch side: mmdet SingleRoIExtractor level mapping + mmcv RoIAlign
    wh = ROIS[:, 3:5] - ROIS[:, 1:3]
    scale = np.sqrt(wh[:, 0] * wh[:, 1])
    lvls = np.clip(
        np.floor(np.log2(scale / FINEST + 1e-6)), 0, len(STRIDES) - 1
    ).astype(int)
    assert set(lvls) == {0, 1, 2, 3}, lvls   # fixture covers the levels
    t_roi = torch.cat([
        roi_align_torch(
            t_fpn[l], torch.from_numpy(ROIS[i : i + 1]), (7, 7),
            spatial_scale=1.0 / STRIDES[l], sampling_ratio=0, aligned=True,
        )
        for i, l in enumerate(lvls)
    ])
    t_cls, t_deltas = torso.roi_head.bbox_head(t_roi)

    def fwd(m, x, rois):
        fpn = m.neck(m.backbone(x))
        rf = multilevel_roi_align(
            list(fpn[: len(STRIDES)]), rois, STRIDES, (7, 7),
            finest_scale=FINEST, sampling_ratio=0, max_ratio=3,
        )
        return rf, m.bbox_head(rf)

    j_roi, (j_cls, j_deltas) = jax.jit(
        lambda v, x, r: model.apply(v, x, r, method=fwd)
    )(variables, jnp.asarray(img), jnp.asarray(ROIS))

    _assert_close(j_roi, _nhwc(t_roi), "roi_align 7x7 (all levels)")
    _assert_close(j_cls, t_cls.detach().numpy(), "bbox head cls logits")
    _assert_close(j_deltas, t_deltas.detach().numpy(), "bbox head deltas")
