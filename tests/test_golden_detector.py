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


# ---------------------------------------------------------------------------
# Composed 3D heads (VERDICT r4 #4): the full simple_test sequencing
# (monorun_roi_head.py:442-605) — MC global -> dim decode -> NOC + latent
# injection + CARAFE -> coord decode -> proj-logstd fold -> score — at
# flagship widths, depth-101, dense FPN, with PnP bypassed by feeding both
# stacks identical pose inputs (its own exact oracle lives in test_pnp.py).
# ---------------------------------------------------------------------------

from torch_ref.heads import (
    FCExtractorTorch,
    FCNNOCDecoderTorch,
    MLPScoreHeadTorch,
)


class _PoseHolder(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.cov_calib_logscale = torch.nn.Parameter(torch.zeros(4))


class _Full3DTorch(torch.nn.Module):
    """DetectorTorso + the 3D-head replicas under the reference key space
    (roi_head.global_head / noc_head / score_head / pose_head)."""

    def __init__(self, depth):
        super().__init__()
        t = DetectorTorso(depth=depth)
        self.backbone = t.backbone
        self.neck = t.neck
        self.rpn_head = t.rpn_head
        self.roi_head = t.roi_head
        self.roi_head.global_head = FCExtractorTorch()
        self.roi_head.noc_head = FCNNOCDecoderTorch()
        self.roi_head.score_head = MLPScoreHeadTorch()
        self.roi_head.pose_head = _PoseHolder()

    def stages(self, img):
        self.eval()
        feats = self.backbone(img)
        fpn = self.neck(feats)
        cls_scores, bbox_preds = self.rpn_head(fpn[1:])
        return feats, fpn, cls_scores, bbox_preds


@pytest.fixture(scope="module")
def stacks3d(tmp_path_factory):
    cfg = get_config("kitti_multiclass")
    cfg = dataclasses.replace(
        cfg,
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depth=101),
        neck=dataclasses.replace(cfg.neck, lazy_lower=False),
        # deterministic factored MC (fc_extractor_monte_carlo.py:24 with
        # dropout off -> every sample equals the mean, variance ~0)
        global_head=dataclasses.replace(
            cfg.global_head, dropout_rate=0.0, dropout2d_rate=0.0,
            mc_samples=3,
        ),
        test=dataclasses.replace(
            cfg.test, rpn_nms_pre=128, rpn_nms_post=128, max_per_img=8,
            head_slots=0, debug=True,
        ),
    )
    rng = np.random.default_rng(23)
    tm = _Full3DTorch(depth=101)
    _rescale_torso(tm, rng)
    # BatchNormSmooth1D buffers + cov calib are extra checkpoint state
    # (SURVEY §5): randomize so the converter mapping has real effect
    pn = tm.roi_head.score_head.pose_norm
    pn.weight.data = torch.from_numpy(
        rng.uniform(0.8, 1.2, 17).astype(np.float32))
    pn.bias.data = torch.from_numpy(
        rng.normal(0, 0.05, 17).astype(np.float32))
    pn.running_mean.data = torch.from_numpy(
        rng.normal(0, 0.5, 17).astype(np.float32))
    pn.running_var.data = torch.from_numpy(
        rng.uniform(0.5, 2.0, 17).astype(np.float32))
    tm.roi_head.pose_head.cov_calib_logscale.data = torch.from_numpy(
        rng.uniform(-0.3, 0.3, 4).astype(np.float32))
    # random regression deltas saturate the box decode into full-width
    # slivers; near-zero them so detections stay proposal/anchor-shaped
    # (well-formed boxes across scales for the align parity downstream)
    tm.rpn_head.rpn_reg.weight.data *= 0.01
    tm.rpn_head.rpn_reg.bias.data *= 0.01
    tm.roi_head.bbox_head.fc_reg.weight.data *= 0.01
    tm.roi_head.bbox_head.fc_reg.bias.data *= 0.01

    pth = str(tmp_path_factory.mktemp("golden3d") / "full3d.pth")
    torch.save({"state_dict": tm.state_dict()}, pth)

    model, variables = init_detector(cfg, jax.random.PRNGKey(0), (H, W),
                                     fast=True)
    params, batch_stats, _, report = convert_torch_checkpoint(
        pth, variables["params"], variables["batch_stats"]
    )
    bad = {k: v for k, v in report.items() if v != "ok"}
    assert not bad, bad
    variables = {"params": params, "batch_stats": batch_stats}
    img = rng.normal(0, 1, (1, H, W, 3)).astype(np.float32)
    return cfg, model, variables, tm, img


def _align_at_levels(t_fpn, rois_np, lvls, out_size, strides):
    import torch as _t

    return _t.cat([
        roi_align_torch(
            t_fpn[int(l)],
            _t.from_numpy(rois_np[i : i + 1]), out_size,
            spatial_scale=1.0 / strides[int(l)], sampling_ratio=0,
            aligned=True,
        )
        for i, l in enumerate(lvls)
    ])


def test_composed_3d_heads_through_noc(stacks3d):
    """Drive the REAL jitted serving graph (debug extras on) and replicate
    the 3D-head composition in torch on the same detection boxes; assert
    latent vectors, decoded NOC coordinate maps, and folded proj stds."""
    cfg, model, variables, tm, img = stacks3d
    cam = np.asarray(
        [[[70.0, 0, 128.0], [0, 70.0, 48.0], [0, 0, 1.0]]], np.float32
    )
    shapes = np.asarray([[float(H), float(W)]], np.float32)
    det = jax.jit(lambda v, x, c, s, r: model.apply(v, x, c, s, r))(
        variables, jnp.asarray(img), jnp.asarray(cam),
        jnp.asarray(shapes), jax.random.PRNGKey(7),
    )
    boxes = np.asarray(det.bboxes_2d[0])            # (M, 4)
    labels = np.asarray(det.labels[0])
    # use slots with a real box (NMS-kept): zero-size padded slots hold
    # degenerate geometry where relative comparisons are meaningless
    keep = (boxes[:, 2] - boxes[:, 0] > 2) & (boxes[:, 3] - boxes[:, 1] > 2)
    assert keep.sum() >= 2, boxes
    idx = np.where(keep)[0]
    rois_np = np.concatenate(
        [np.zeros((len(idx), 1), np.float32), boxes[idx]], axis=1
    )
    labels_t = torch.from_numpy(labels[idx].astype(np.int64))

    with torch.no_grad():
        _, t_fpn, _, _ = tm.stages(
            torch.from_numpy(np.moveaxis(img, -1, 1).copy())
        )
        from monorun_tpu.ops.roi_align import assign_fpn_levels

        bstr = cfg.bbox_head.featmap_strides
        lvls7 = np.asarray(assign_fpn_levels(
            jnp.asarray(rois_np), len(bstr), cfg.bbox_head.finest_scale,
            long_span_cap=96 - 18, stride0=float(bstr[0]),
        ))
        reg7 = _align_at_levels(t_fpn, rois_np, lvls7, (7, 7), bstr)
        dim_latent, reg_fc = tm.roi_head.global_head(reg7)
        n = dim_latent.shape[0]
        inds = torch.arange(n)
        dl = dim_latent.view(n, 3, 19)[inds, labels_t]
        dim_enc, latent = dl[:, :3], dl[:, 3:]
        means = torch.tensor(cfg.global_head.dim_means)[labels_t]
        stds = torch.tensor(cfg.global_head.dim_stds)[labels_t]
        dims = dim_enc * stds + means                 # dim_coder.decode

        nstr = cfg.noc_head.featmap_strides
        lvls14 = np.asarray(assign_fpn_levels(
            jnp.asarray(rois_np), len(nstr), cfg.noc_head.finest_scale,
            long_span_cap=96 - 18, stride0=float(nstr[0]),
        ))
        noc14 = _align_at_levels(t_fpn, rois_np, lvls14, (14, 14), nstr)
        noc, logstd = tm.roi_head.noc_head(
            noc14, latent, labels_t, torch.zeros(n, dtype=torch.long)
        )
        # coord_coder.decode (noc_coder.py:48-73), noc_var=None
        nmeans = torch.tensor(cfg.noc_head.noc_means)[:, None, None]
        nstds = torch.tensor(cfg.noc_head.noc_stds)[:, None, None]
        part_norm = noc * nstds + nmeans
        coords3d = part_norm * dims[:, :, None, None]
        # proj decode_logstd with coords_3d_var -> 0 (MC var is ~0 with
        # dropout off) and distance None reduces to the identity fold
        std_exp = torch.exp(logstd)

    # jax side: the REAL serving graph's debug extras
    oc = np.asarray(det.extras["oc_maps"][0])[idx]    # (n, 28, 28, 3)
    sd = np.asarray(det.extras["std_maps"][0])[idx]   # (n, 28, 28, 2)
    lv = np.asarray(det.extras["latent_vecs"][0])[idx]

    _assert_close(lv, latent.numpy(), "latent vectors (MC mean)")
    _assert_close(
        oc, np.moveaxis(coords3d.numpy(), 1, -1), "decoded NOC maps",
        rtol=4e-3,
    )
    _assert_close(
        sd, np.moveaxis(std_exp.numpy(), 1, -1), "folded proj stds",
        rtol=4e-3,
    )


def test_composed_score_stage_identical_pose(stacks3d):
    """Score-head stage on identical fed poses (PnP bypassed): calibrated
    covariance (uncert_prop_pnp_optimizer.py:96-97) -> distance correction
    (distance_invar_proj_error_coder.py:62-63) -> BatchNormSmooth1D + MLP
    fusion (mlp_score_head.py:94-115) -> sigmoid scores."""
    cfg, model, variables, tm, img = stacks3d
    rng = np.random.default_rng(5)
    n = 6
    yaw = rng.uniform(-np.pi, np.pi, (n, 1)).astype(np.float32)
    t_vec = np.stack([
        rng.uniform(-5, 5, n), rng.uniform(-1, 2, n), rng.uniform(4, 30, n)
    ], 1).astype(np.float32)
    a = rng.normal(0, 0.3, (n, 4, 4)).astype(np.float32)
    cov = a @ np.swapaxes(a, 1, 2) + 0.05 * np.eye(4, dtype=np.float32)
    dims = rng.uniform(0.5, 4.0, (n, 3)).astype(np.float32)
    reg_fc = rng.normal(0, 0.5, (n, 1024)).astype(np.float32)

    with torch.no_grad():
        s = tm.roi_head.pose_head.cov_calib_logscale.exp()
        calib = (s[:, None] * s[None, :]).numpy() * cov
        dist = np.linalg.norm(t_vec, axis=1)          # distance_mode=range
        denom = (cfg.projection_head.ref_length
                 * cfg.projection_head.ref_focal_y
                 * cfg.projection_head.target_std)
        corr = calib * (denom / dist[:, None, None]) ** 2
        t_logit = tm.roi_head.score_head(
            torch.from_numpy(reg_fc), torch.from_numpy(yaw),
            torch.from_numpy(t_vec), torch.from_numpy(corr),
            torch.from_numpy(dims),
        )
        t_scores = torch.sigmoid(t_logit).numpy()

    from monorun_tpu.coders import ProjErrorCoder

    def score_fwd(m, cov_in, rf, yw, tv, dm):
        calib_j = m.calibrated_cov(cov_in)
        pc = ProjErrorCoder(
            cfg.projection_head.ref_length,
            cfg.projection_head.ref_focal_y,
            cfg.projection_head.target_std,
        )
        d = jnp.linalg.norm(tv, axis=1)
        corr_j = pc.cov_correction(calib_j, jnp.clip(d, 1e-3, None))
        logits = m.score_head(rf, yw, tv, corr_j, dm, train=False)
        return jax.nn.sigmoid(logits), calib_j, corr_j

    j_scores, j_calib, j_corr = jax.jit(
        lambda v, *a: model.apply(v, *a, method=score_fwd)
    )(
        variables, jnp.asarray(cov), jnp.asarray(reg_fc),
        jnp.asarray(yaw), jnp.asarray(t_vec), jnp.asarray(dims),
    )
    _assert_close(j_calib, calib, "calibrated covariance")
    _assert_close(j_corr, corr, "distance-corrected covariance")
    _assert_close(j_scores, t_scores, "3D localization scores")
