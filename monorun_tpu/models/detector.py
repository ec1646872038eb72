"""MonoRUn detector: the full fixed-shape inference graph.

Sequencing mirrors MonoRUnRoIHead.simple_test (monorun_roi_head.py:442-605):
backbone -> FPNplus -> RPN proposals -> bbox head + multiclass NMS ->
[global head (MC) -> dim decode -> NOC head -> coord decode -> logstd
decode -> PnP -> cov calibration/correction -> score head] -> per-class
rotated-BEV 3D NMS.

Unlike the reference (batch==1 assert at monorun_roi_head.py:452, per-RoI
host PnP loop, x50 MC replication), everything here is batched over images
AND RoIs with static shapes: B images produce exactly (B, max_per_img)
detection slots with validity masks, and the whole graph jits into a
single XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..coders import DimCoder, NOCCoder, ProjErrorCoder
from ..config import MonoRUnConfig
from ..ops.nms import NEG_INF, nms_rotated_bev
from ..ops.pnp import PnPConfig, pnp_uncert
from ..ops.roi_align import (
    multilevel_roi_align_auto,
    prepare_pyramid,
    roi_grid_centers,
)
from .bbox_head import BBoxHead, get_det_bboxes
from .fpn import FPNplus
from .global_head import GlobalHead, slice_pred
from .noc_head import NOCHead
from .resnet import ResNet
from .rpn import RPNHead, get_proposals
from .score_head import ScoreHead

Array = jnp.ndarray

# Adaptive-sampling caps for the RoI aligns come from
# cfg.bbox_head.align_max_ratio (7x7) / cfg.noc_head.align_max_ratio
# (14x14) — see config.py for the mmcv-exactness rationale.


class Detections(NamedTuple):
    """Fixed-shape per-image detection results."""

    bboxes_2d: Array      # (B, M, 4) xyxy
    scores_2d: Array      # (B, M)
    labels: Array         # (B, M) int, -1 invalid
    bboxes_3d: Array      # (B, M, 8) [l, h, w, x, y, z, ry, score]
    valid: Array          # (B, M) bool (post 3D NMS)
    pose_cov: Array       # (B, M, 4, 4)
    extras: Dict[str, Array]   # debug maps when cfg.test.debug


def _dtype(cfg: MonoRUnConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _align_strides(cfg: MonoRUnConfig, strides):
    """Sampling strides for the RoI aligns.

    With the lazy FPN lower level (NeckConfig.lazy_lower) the declared
    stride-2 level is physically a stride-4 map; RoI-to-level ASSIGNMENT
    is unchanged (assign_fpn_levels uses finest_scale only), and the
    sampling COORDINATES are exact: aligned RoIAlign of the stride-2 map
    at u/2 - 0.5 corresponds to underlying stride-4 positions u/4 - 0.5.
    The level's VALUES still deviate from the reference's dense
    conv(up2(lateral)) build — the conv grid changes — see NeckConfig.
    """
    if cfg.neck.lazy_lower and strides and strides[0] == 2:
        return (4,) + tuple(strides[1:])
    return tuple(strides)


class MonoRUn(nn.Module):
    """Flax module holding all sub-networks."""

    cfg: MonoRUnConfig

    def setup(self):
        cfg = self.cfg
        dt = _dtype(cfg)
        self.backbone = ResNet(
            depth=cfg.backbone.depth,
            out_indices=cfg.backbone.out_indices,
            dtype=dt,
            name="backbone",
        )
        self.neck = FPNplus(
            out_channels=cfg.neck.out_channels,
            num_outs=cfg.neck.num_outs,
            num_lower_outs=cfg.neck.num_lower_outs,
            lazy_lower=cfg.neck.lazy_lower,
            dtype=dt,
            name="neck",
        )
        n_anchors = len(cfg.rpn.anchors.scales) * len(cfg.rpn.anchors.ratios)
        self.rpn_head = RPNHead(
            feat_channels=cfg.rpn.feat_channels,
            num_anchors=n_anchors,
            dtype=dt,
            name="rpn_head",
        )
        self.bbox_head = BBoxHead(cfg.bbox_head, dtype=dt, name="bbox_head")
        self.global_head = GlobalHead(
            cfg.global_head, dtype=dt, name="global_head"
        )
        self.noc_head = NOCHead(cfg.noc_head, dtype=dt, name="noc_head")
        self.score_head = ScoreHead(
            cfg.score_head, dtype=dt, name="score_head"
        )
        # learnable covariance calibration (uncert_prop_pnp_optimizer.py:44)
        self.cov_calib_logscale = self.param(
            "cov_calib_logscale", nn.initializers.zeros, (4,)
        )

    # ---- shared pieces ---------------------------------------------------

    def extract_feats(self, images: Array) -> Tuple[Array, ...]:
        return self.neck(self.backbone(images))

    def extract_feats_raw(self, raw: Array, raw_shapes: Array):
        """uint8-canvas serving entry: on-device resize/normalize/pad
        (data/pipeline.py:device_preprocess — the reference's host-side
        LoadImage -> Normalize -> Pad3D, apis/inference.py:51-75) fused in
        front of the backbone. ``raw`` is (B, raw_height, raw_width, 3)
        uint8 with each image pasted top-left at native resolution."""
        from ..data.pipeline import device_preprocess

        images, _ = device_preprocess(raw, raw_shapes, self.cfg.data)
        return self.extract_feats(images)

    def serve_raw(
        self, raw: Array, cam_native: Array, raw_shapes: Array, rng: Array,
    ) -> "Detections":
        """Full raw-input serving program: preprocessing + detection in
        one jitted graph. ``cam_native`` is the native-resolution K; the
        test_scale intrinsic rescale happens on device too."""
        from ..data.pipeline import device_preprocess, scale_intrinsics

        cfg = self.cfg
        images, shapes = device_preprocess(raw, raw_shapes, cfg.data)
        cam = scale_intrinsics(cam_native, cfg.data.test_scale)
        feats = self.extract_feats(images)
        return self.heads_forward(
            feats, cam, shapes, rng,
            pad_shape=(cfg.data.pad_height, cfg.data.pad_width),
        )

    def run_rpn(self, feats) -> Tuple[Any, Any]:
        lvl0 = self.cfg.rpn.starting_level
        return self.rpn_head(feats[lvl0:])

    def calibrated_cov(self, pose_cov: Array) -> Array:
        s = jnp.exp(self.cov_calib_logscale)
        return (s[:, None] * s[None, :]) * pose_cov

    # ---- inference -------------------------------------------------------

    def __call__(
        self,
        images: Array,          # (B, H, W, 3) normalised + padded
        cam_intrinsic: Array,   # (B, 3, 3)
        img_shapes: Array,      # (B, 2) true (h, w) before padding
        rng: Array,
    ) -> Detections:
        feats = self.extract_feats(images)
        return self.heads_forward(
            feats, cam_intrinsic, img_shapes, rng,
            pad_shape=(images.shape[1], images.shape[2]),
        )

    def heads_forward(
        self,
        feats,                  # backbone+neck pyramid (extract_feats)
        cam_intrinsic: Array,   # (B, 3, 3)
        img_shapes: Array,      # (B, 2) true (h, w) before padding
        rng: Array,
        pad_shape: Tuple[int, int],
    ) -> Detections:
        """RPN → proposals → aligns → heads → PnP → 3D NMS: everything
        after the backbone+neck. Split from ``__call__`` so cold-start
        warm-up (utils/warm_start.py) can compile it concurrently with
        ``extract_feats`` and the Pallas align kernel micro-programs."""
        cfg = self.cfg
        tc = cfg.test
        B = cam_intrinsic.shape[0]
        M = tc.max_per_img

        cls_scores, bbox_preds = self.run_rpn(feats)
        proposals, prop_valid = get_proposals(
            cls_scores, bbox_preds, cfg.rpn, pad_shape,
            tc.rpn_nms_pre, tc.rpn_nms_post, valid_shapes=img_shapes,
        )                                           # (B, P, 4), (B, P)

        P = proposals.shape[1]
        batch_col = jnp.repeat(jnp.arange(B, dtype=proposals.dtype), P)
        rois = jnp.concatenate(
            [batch_col[:, None], proposals.reshape(B * P, 4)], axis=1
        )
        # one flat pyramid shared by the three align calls below
        pyr = prepare_pyramid(feats[: len(cfg.bbox_head.featmap_strides)])
        roi_feats = multilevel_roi_align_auto(
            feats[: len(cfg.bbox_head.featmap_strides)], rois,
            _align_strides(cfg, cfg.bbox_head.featmap_strides), (7, 7),
            cfg.bbox_head.finest_scale, max_ratio=cfg.bbox_head.align_max_ratio, tile_h=24,
            pyramid=pyr,
        )
        cls_logits, deltas = self.bbox_head(roi_feats)

        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda r, cl, dl, v: get_det_bboxes(
                r, cl, dl, v, pad_shape, cfg.bbox_head,
                tc.score_thr, tc.nms_iou_thr, M,
            )
        )(
            proposals,
            cls_logits.reshape(B, P, -1),
            deltas.reshape(B, P, -1),
            prop_valid,
        )                                           # (B, M, ...)

        det_labels = jnp.clip(det_labels, 0, cfg.bbox_head.num_classes - 1)

        # ---- head-slot bucketing -----------------------------------------
        # NMS slots come out score-sorted (ops/nms.py:_nms_impl), so the
        # top-K slice keeps the K best detections per image. The reference
        # runs the 3D heads on the dynamic set of NMS survivors
        # (monorun_roi_head.py:simple_test) — usually well under 48 on
        # KITTI — while fixed shapes would otherwise pay all max_per_img
        # slots every frame. head_slots=0 computes every slot.
        K = tc.head_slots if 0 < tc.head_slots < M else M
        hd_boxes = det_boxes[:, :K]
        hd_labels = det_labels[:, :K]
        hd_valid = det_valid[:, :K]
        flat_labels = hd_labels.reshape(B * K)
        det_batch = jnp.repeat(jnp.arange(B, dtype=det_boxes.dtype), K)
        det_rois = jnp.concatenate(
            [det_batch[:, None], hd_boxes.reshape(B * K, 4)], axis=1
        )

        # ---- global head (factored MC dropout) ---------------------------
        rng_mc, rng_pnp = jax.random.split(rng)
        reg_feats = multilevel_roi_align_auto(
            feats[: len(cfg.bbox_head.featmap_strides)], det_rois,
            _align_strides(cfg, cfg.bbox_head.featmap_strides), (7, 7),
            cfg.bbox_head.finest_scale, max_ratio=cfg.bbox_head.align_max_ratio, tile_h=24,
            pyramid=pyr,
        )
        gout = self.global_head(reg_feats, train=False, rng=rng_mc)
        dim_enc, dim_var_enc, latent, latent_var = slice_pred(
            cfg.global_head, gout.dim_latent_pred, gout.dim_latent_var,
            flat_labels,
        )
        dim_coder = DimCoder(cfg.global_head.dim_means, cfg.global_head.dim_stds)
        dims, dims_var = dim_coder.decode(dim_enc, dim_var_enc, flat_labels)

        # ---- NOC head -----------------------------------------------------
        noc_feats = multilevel_roi_align_auto(
            feats[: len(cfg.noc_head.featmap_strides)], det_rois,
            _align_strides(cfg, cfg.noc_head.featmap_strides),
            (cfg.noc_head.roi_size, cfg.noc_head.roi_size),
            cfg.noc_head.finest_scale, max_ratio=cfg.noc_head.align_max_ratio, tile_h=32,
            pyramid=pyr,
        )
        flip = jnp.zeros((B * K,), bool)
        nout = self.noc_head(
            noc_feats, latent, flat_labels, flip, train=False
        )

        noc_coder = NOCCoder(cfg.noc_head.noc_means, cfg.noc_head.noc_stds)
        coords_3d, coords_3d_var = noc_coder.decode(
            nout.noc_pred, None, dims, dims_var, flip
        )
        # fold MC epistemic variance of the latent path: the reference
        # propagates dim/latent variance through the coord decode; latent
        # variance enters via noc_var=None there too (monorun_roi_head.py:513)

        proj_coder = ProjErrorCoder(
            cfg.projection_head.ref_length,
            cfg.projection_head.ref_focal_y,
            cfg.projection_head.target_std,
        )
        proj_logstd = proj_coder.decode_logstd(
            nout.proj_logstd, coords_3d_var, None
        )

        # ---- PnP ----------------------------------------------------------
        dsz = cfg.noc_head.dense_size
        coords_2d_roi = roi_grid_centers(det_rois, (dsz, dsz))  # (BM,28,28,2)
        istd = jnp.exp(-proj_logstd) / cfg.pose_head.std_scale

        n_pts = dsz * dsz
        shapes_per_det = jnp.repeat(img_shapes, K, axis=0)      # (BK, 2)
        border = cfg.pose_head.allowed_border
        u_range = jnp.stack(
            [jnp.full((B * K,), -border), shapes_per_det[:, 1] + border], -1
        )
        v_range = jnp.stack(
            [jnp.full((B * K,), -border), shapes_per_det[:, 0] + border], -1
        )
        roi_heights = coords_2d_roi[:, -1, 0, 1] - coords_2d_roi[:, 0, 0, 1]
        ransac_thr = cfg.pose_head.epnp_ransac_thres_ratio * roi_heights

        cams_per_det = jnp.repeat(cam_intrinsic, K, axis=0)
        pnp = pnp_uncert(
            coords_2d_roi.reshape(B * K, n_pts, 2),
            istd.reshape(B * K, n_pts, 2),
            coords_3d.reshape(B * K, n_pts, 3),
            cams_per_det,
            u_range,
            v_range,
            ransac_thr=ransac_thr,
            rng=rng_pnp,
            cfg=PnPConfig(
                z_min=cfg.pose_head.z_min,
                istd_thres=cfg.pose_head.epnp_istd_thres,
                inlier_opt_only=cfg.pose_head.inlier_opt_only,
                ransac_hypotheses=cfg.pose_head.ransac_hypotheses,
                lm_iters=cfg.pose_head.lm_iters,
                exact_hessian=cfg.pose_head.forward_exact_hessian,
            ),
        )

        pose_cov_calib = self.calibrated_cov(pnp.pose_cov)
        if tc.cov_correction:
            if cfg.projection_head.distance_mode == "z-depth":
                distance = pnp.t_vec[:, 2]
            else:
                distance = jnp.linalg.norm(pnp.t_vec, axis=1)
            pose_cov_calib = proj_coder.cov_correction(
                pose_cov_calib, jnp.clip(distance, 1e-3, None)
            )

        # ---- score head ----------------------------------------------------
        score_cov = pose_cov_calib if tc.calib_scoring else pnp.pose_cov
        logits = self.score_head(
            gout.reg_fc_out, pnp.yaw, pnp.t_vec, score_cov, dims,
            train=False,
        )
        scores_3d = jax.nn.sigmoid(logits)
        scores_3d = jnp.where(pnp.valid, scores_3d, 0.0)
        final_scores = (
            det_scores[:, :K].reshape(B * K) * scores_3d
            if tc.mult_2d_score
            else scores_3d
        )
        final_scores = jnp.where(hd_valid.reshape(B * K), final_scores, 0.0)

        bboxes_3d = jnp.concatenate(
            [dims, pnp.t_vec, pnp.yaw, final_scores[:, None]], axis=1
        ).reshape(B, K, 8)

        # ---- per-class rotated-BEV 3D NMS ---------------------------------
        # one fixpoint pass with per-class center offsets replaces three
        # sequential greedy loops (300 serialized steps -> matrix ops);
        # fixpoint_iters=K makes the fixpoint EXACT for any suppression
        # chain (depth cannot exceed the slot count) at the cost of a few
        # extra (K, K) passes — the old fixed 12 iterations only upper-
        # bounded the greedy set on chains deeper than 12
        def _nms3d_single(b3d, labels_i, valid_i):
            bev = b3d[:, jnp.asarray([3, 5, 0, 2, 6])]   # x, z, l, w, ry
            extent = 1e4
            off = (labels_i.astype(bev.dtype) * extent)[:, None]
            bev = bev.at[:, :2].add(off)
            s = jnp.where(valid_i, b3d[:, 7], NEG_INF)
            idx, v = nms_rotated_bev(
                bev, s, tc.nms_3d_thr, K, exact=False, fixpoint_iters=K,
            )
            return jnp.zeros((K,), bool).at[idx].set(v)

        keep3d = jax.vmap(_nms3d_single)(
            bboxes_3d, hd_labels, hd_valid
        )
        final_valid = hd_valid & keep3d & pnp.valid.reshape(B, K)

        # sanitise padded/invalid slots so downstream consumers (and
        # reductions over the fixed-shape arrays) never see NaN/garbage
        bboxes_3d = jnp.where(final_valid[..., None], bboxes_3d, 0.0)

        extras: Dict[str, Array] = {}
        if tc.debug:
            extras = dict(
                oc_maps=coords_3d.reshape(B, K, dsz, dsz, 3),
                std_maps=jnp.exp(proj_logstd).reshape(B, K, dsz, dsz, 2),
                latent_vecs=latent.reshape(B, K, -1),
            )

        pose_cov_out = jnp.where(
            final_valid[..., None, None],
            pose_cov_calib.reshape(B, K, 4, 4),
            jnp.eye(4),
        )
        if K < M:
            # pad the head outputs back to the fixed max_per_img slot
            # count; tail slots are invalid (pose_cov keeps identity)
            tail = ((0, 0), (0, M - K))
            bboxes_3d = jnp.pad(bboxes_3d, tail + ((0, 0),))
            final_valid = jnp.pad(final_valid, tail)
            pose_cov_out = jnp.pad(pose_cov_out, tail + ((0, 0), (0, 0)))
            pose_cov_out = jnp.where(
                (jnp.arange(M) >= K)[None, :, None, None],
                jnp.eye(4, dtype=pose_cov_out.dtype),
                pose_cov_out,
            )
            extras = {
                k: jnp.pad(
                    v, tail + ((0, 0),) * (v.ndim - 2)
                ) for k, v in extras.items()
            }

        return Detections(
            bboxes_2d=det_boxes,
            scores_2d=det_scores,
            labels=det_labels,
            bboxes_3d=bboxes_3d,
            valid=final_valid,
            pose_cov=pose_cov_out,
            extras=extras,
        )


def _train_forward(
    self,
    batch: Dict[str, Array],
    rng: Array,
    step: Array,
    loss_ema: Array,
):
    """Training losses for one batch (MonoRUnRoIHead.forward_train flow,
    monorun_roi_head.py:99-254, with fixed-shape assignment/sampling).

    batch keys: images (B,H,W,3), cam (B,3,3), img_shapes (B,2),
    gt_boxes (B,G,4), gt_labels (B,G), gt_valid (B,G),
    ignore_boxes (B,I,4), ignore_valid (B,I), gt_bboxes_3d (B,G,7)
    [l,h,w,x,y,z,ry], flip (B,), uv (B,G,Q,2), oc (B,G,Q,3),
    pts_valid (B,G,Q).

    Returns (total_loss, (metrics, new_loss_ema)).
    """
    from ..losses import (
        kl_loss_mv,
        robust_kl_loss,
        sigmoid_bce_loss,
        smooth_l1_loss,
        softmax_ce_loss,
    )
    from ..ops.box_coder import delta_decode, delta_encode
    from ..ops.geometry import project_points
    from ..ops.rotated_iou import bbox3d_overlaps_aligned
    from ..targets.assigner import AssignCfg, assign_max_iou
    from ..targets.dense_target import encode_noc_points, sparse_noc_targets
    from ..targets.rpn_targets import rpn_loss
    from ..targets.sampler import sample_rois
    from .score_head import iou3d_balanced_sample_weights, score_targets

    cfg = self.cfg
    tr = cfg.train
    B, H, W = batch["images"].shape[:3]
    pad_shape = (H, W)
    G = batch["gt_boxes"].shape[1]
    K = cfg.bbox_head.num_classes

    (rng_rpn, rng_assign, rng_gh, rng_noc, rng_pnp, rng_score) = (
        jax.random.split(rng, 6)
    )

    feats = self.extract_feats(batch["images"])
    cls_scores, bbox_preds = self.run_rpn(feats)

    losses = rpn_loss(
        rng_rpn, cls_scores, bbox_preds, batch["gt_boxes"],
        batch["gt_valid"], batch["ignore_boxes"], batch["ignore_valid"],
        cfg.rpn, tr,
    )

    proposals, prop_valid = get_proposals(
        cls_scores, bbox_preds, cfg.rpn, pad_shape,
        cfg.rpn.train_nms_pre, cfg.rpn.nms_post,
        valid_shapes=batch["img_shapes"],
    )

    # ---- assign + sample (add GTs as proposals) ---------------------------
    cand_boxes = jnp.concatenate([proposals, batch["gt_boxes"]], axis=1)
    cand_valid = jnp.concatenate([prop_valid, batch["gt_valid"]], axis=1)
    acfg = AssignCfg(
        pos_iou_thr=tr.rcnn_pos_iou_thr,
        neg_iou_thr=tr.rcnn_neg_iou_thr,
        min_pos_iou=tr.rcnn_min_pos_iou,
        ignore_iof_thr=tr.rcnn_ignore_iof_thr,
    )

    def per_image(rng_i, cb, cv, gb, gv, gl, ib, iv):
        res = assign_max_iou(
            cb, cv, gb, gv, gl, acfg, ignore_boxes=ib, ignore_valid=iv
        )
        return sample_rois(
            rng_i, cb, res.assigned_gt, res.labels, tr.rcnn_num_samples,
            tr.rcnn_pos_fraction, max_pos=tr.max_pos,
        )

    samp = jax.vmap(per_image)(
        jax.random.split(rng_assign, B), cand_boxes, cand_valid,
        batch["gt_boxes"], batch["gt_valid"], batch["gt_labels"],
        batch["ignore_boxes"], batch["ignore_valid"],
    )

    P = tr.max_pos                      # positives per image
    Nneg = tr.rcnn_num_samples - P
    all_boxes = jnp.concatenate([samp.pos_boxes, samp.neg_boxes], axis=1)
    all_valid = jnp.concatenate([samp.pos_valid, samp.neg_valid], axis=1)
    batch_col = jnp.repeat(
        jnp.arange(B, dtype=all_boxes.dtype), tr.rcnn_num_samples
    )
    rois = jnp.concatenate(
        [batch_col[:, None], all_boxes.reshape(-1, 4)], axis=1
    )
    pyr = prepare_pyramid(feats[: len(cfg.bbox_head.featmap_strides)])
    roi_feats = multilevel_roi_align_auto(
        feats[: len(cfg.bbox_head.featmap_strides)], rois,
        _align_strides(cfg, cfg.bbox_head.featmap_strides), (7, 7),
        cfg.bbox_head.finest_scale, max_ratio=cfg.bbox_head.align_max_ratio, tile_h=24,
            pyramid=pyr,
    )
    cls_logits, deltas = self.bbox_head(roi_feats)

    # ---- bbox head losses -------------------------------------------------
    bg = K
    labels_all = jnp.concatenate(
        [samp.pos_labels, jnp.full((B, Nneg), bg, jnp.int32)], axis=1
    ).reshape(-1)
    valid_flat = all_valid.reshape(-1)
    n_total = jnp.sum(valid_flat)
    losses["loss_cls"] = softmax_ce_loss(
        cls_logits, labels_all, weight=valid_flat.astype(jnp.float32),
        avg_factor=n_total,
    )

    pos_gt_boxes = jnp.take_along_axis(
        batch["gt_boxes"], samp.pos_gt_inds[..., None], axis=1
    )
    reg_targets = delta_encode(
        samp.pos_boxes, pos_gt_boxes, cfg.bbox_head.target_means,
        cfg.bbox_head.target_stds,
    )                                            # (B, P, 4)
    deltas_k = deltas.reshape(B, tr.rcnn_num_samples, K, 4)[:, :P]
    pos_deltas = jnp.take_along_axis(
        deltas_k, samp.pos_labels[..., None, None].astype(jnp.int32)
        .repeat(4, -1), axis=2,
    )[:, :, 0]                                   # (B, P, 4)
    losses["loss_bbox"] = smooth_l1_loss(
        pos_deltas, reg_targets, beta=1.0,
        weight=samp.pos_valid[..., None].astype(jnp.float32),
        avg_factor=n_total,
    )

    if tr.refined_reassign:
        # ---- cascade-style re-assign + re-sample (no grad) ---------------
        # Mirrors monorun_roi_head.py:141-166 (bbox_refined_assigner/
        # bbox_refined_sampler): every sampled RoI is refined by its class
        # — the ASSIGNED class for positives, the argmax PREDICTED class
        # for the rest (mmdet refine_bboxes semantics) — GT-sourced
        # positives are dropped from the refined proposal set, and the 3D
        # heads train on a fresh assign+sample against those refined
        # boxes (GTs re-appended, RandomSampler add_gt_as_proposals
        # default). Unused by the reference's shipped configs, so OFF by
        # default; fixed-shape here: dropping = marking invalid.
        Ns = tr.rcnn_num_samples
        deltas_sg = jax.lax.stop_gradient(deltas).reshape(B, Ns, K, 4)
        cls_sg = jax.lax.stop_gradient(cls_logits).reshape(B, Ns, -1)
        pred_lbl = jnp.argmax(cls_sg[..., :K], axis=-1)
        lbl_mat = labels_all.reshape(B, Ns)
        roi_lbl = jnp.where(lbl_mat == bg, pred_lbl, lbl_mat)
        sel_deltas = jnp.take_along_axis(
            deltas_sg, roi_lbl[..., None, None].astype(jnp.int32)
            .repeat(4, -1), axis=2,
        )[:, :, 0]                                   # (B, Ns, 4)
        refined_all = delta_decode(
            all_boxes, sel_deltas, cfg.bbox_head.target_means,
            cfg.bbox_head.target_stds, max_shape=pad_shape,
        )
        n_props = proposals.shape[1]
        pos_is_gt = samp.pos_inds >= n_props         # (B, P)
        refined_valid = jnp.concatenate(
            [samp.pos_valid & ~pos_is_gt, samp.neg_valid], axis=1
        )
        cand2 = jnp.concatenate([refined_all, batch["gt_boxes"]], axis=1)
        cand2_valid = jnp.concatenate(
            [refined_valid, batch["gt_valid"]], axis=1
        )
        samp = jax.vmap(per_image)(
            jax.random.split(jax.random.fold_in(rng_assign, 1), B),
            cand2, cand2_valid, batch["gt_boxes"], batch["gt_valid"],
            batch["gt_labels"], batch["ignore_boxes"],
            batch["ignore_valid"],
        )
        pos_boxes = samp.pos_boxes
    else:
        # ---- positive-RoI refinement (regress_by_class, no grad) ---------
        # the reference's default branch: refine positives in place
        # without re-assigning (monorun_roi_head.py:168-176)
        refined = delta_decode(
            samp.pos_boxes, jax.lax.stop_gradient(pos_deltas),
            cfg.bbox_head.target_means, cfg.bbox_head.target_stds,
            max_shape=pad_shape,
        )
        pos_boxes = jnp.where(
            samp.pos_valid[..., None], refined, samp.pos_boxes
        )

    # ---- 3D heads on the positive slots -----------------------------------
    pos_batch_col = jnp.repeat(jnp.arange(B, dtype=pos_boxes.dtype), P)
    pos_rois = jnp.concatenate(
        [pos_batch_col[:, None], pos_boxes.reshape(-1, 4)], axis=1
    )
    flat_pos_valid = samp.pos_valid.reshape(-1)
    flat_pos_labels = samp.pos_labels.reshape(-1)
    flat_gt_inds = samp.pos_gt_inds.reshape(-1)

    pos_gt_3d = jax.vmap(lambda g, i: g[i])(
        batch["gt_bboxes_3d"], samp.pos_gt_inds
    ).reshape(-1, 7)                              # [l,h,w,x,y,z,ry]

    reg_feats = multilevel_roi_align_auto(
        feats[: len(cfg.bbox_head.featmap_strides)], pos_rois,
        _align_strides(cfg, cfg.bbox_head.featmap_strides), (7, 7),
        cfg.bbox_head.finest_scale, max_ratio=cfg.bbox_head.align_max_ratio, tile_h=24,
            pyramid=pyr,
    )
    gout = self.global_head(reg_feats, train=True, rng=rng_gh)
    dim_enc, _, latent, _ = slice_pred(
        cfg.global_head, gout.dim_latent_pred, None, flat_pos_labels
    )
    dim_coder = DimCoder(cfg.global_head.dim_means, cfg.global_head.dim_stds)
    dim_targets = dim_coder.encode(pos_gt_3d[:, :3], flat_pos_labels)
    losses["loss_dim"] = smooth_l1_loss(
        dim_enc, dim_targets, beta=1.0,
        weight=flat_pos_valid[:, None].astype(jnp.float32),
    )
    if tr.debug:
        # head-isolation mode: downstream consumers see GT dims
        # (monorun_roi_head.py:323-324)
        dim_enc = dim_targets

    noc_feats = multilevel_roi_align_auto(
        feats[: len(cfg.noc_head.featmap_strides)], pos_rois,
        _align_strides(cfg, cfg.noc_head.featmap_strides),
        (cfg.noc_head.roi_size, cfg.noc_head.roi_size),
        cfg.noc_head.finest_scale, max_ratio=cfg.noc_head.align_max_ratio, tile_h=32,
            pyramid=pyr,
    )
    flip_pos = jnp.repeat(batch["flip"], P)
    nout = self.noc_head(
        noc_feats, latent, flat_pos_labels, flip_pos, train=True,
        rng=rng_noc,
    )

    noc_pred, proj_logstd_enc = nout.noc_pred, nout.proj_logstd
    if cfg.noc_head.with_lidar_loss:
        oc_enc = encode_noc_points(
            batch["oc"],
            batch["gt_bboxes_3d"][:, :, None, :3],
            batch["flip"][:, None, None],
            cfg.noc_head.noc_means, cfg.noc_head.noc_stds,
        )                                         # (B, G, Q, 3)

        def tgt_one(pr, pv, pg, uv_b, oc_b, ok_b):
            return sparse_noc_targets(
                pr, pv, pg, uv_b, oc_b, ok_b, cfg.noc_head.dense_size
            )

        tg, wg = jax.vmap(tgt_one)(
            pos_boxes, samp.pos_valid, samp.pos_gt_inds, batch["uv"],
            oc_enc, batch["pts_valid"],
        )
        dsz = cfg.noc_head.dense_size
        losses["loss_noc"] = smooth_l1_loss(
            nout.noc_pred, tg.reshape(-1, dsz, dsz, 3), beta=1.0,
            weight=(
                wg.reshape(-1, dsz, dsz, 1)
                * flat_pos_valid[:, None, None, None]
            ),
        )
        if tr.debug:
            # head-isolation mode: substitute GT NOC targets and a
            # target-weight-derived logstd (monorun_roi_head.py:357-361:
            # proj_logstd = log(1/clamp(noc_weights)) on both channels)
            noc_pred = tg.reshape(-1, dsz, dsz, 3)
            w_dbg = jnp.clip(wg.reshape(-1, dsz, dsz, 1), 1e-6, 1e6)
            proj_logstd_enc = jnp.broadcast_to(
                -jnp.log(w_dbg), (*noc_pred.shape[:3], 2)
            )

    # ---- decode + projection loss -----------------------------------------
    noc_coder = NOCCoder(cfg.noc_head.noc_means, cfg.noc_head.noc_stds)
    dims, _ = dim_coder.decode(dim_enc, None, flat_pos_labels)
    coords_3d, _ = noc_coder.decode(
        noc_pred, None, dims, None, flip_pos
    )
    dsz = cfg.noc_head.dense_size
    coords_2d_roi = roi_grid_centers(pos_rois, (dsz, dsz))

    cams_pos = jnp.repeat(batch["cam"], P, axis=0)
    shapes_pos = jnp.repeat(batch["img_shapes"], P, axis=0)

    # Geometric augs keep all 3D geometry in the ORIGINAL camera frame
    # (reference RandomFlip3D/Resize3D/Crop3D transform only image/2D
    # boxes/dense fields; the transformed coord_2d field carries
    # original-frame pixel values — transforms.py). Our analytic grid
    # lives in augmented coords, so invert flip -> crop -> resize:
    #   u_orig = ((flip ? W-1-u : u) + crop_x) / scale_w
    scale = jnp.repeat(batch["scale_factor"], P, axis=0)   # (BP, 2) [sh,sw]
    crop = jnp.repeat(batch["crop_offset"], P, axis=0)     # (BP, 2) [x,y]
    u_mirror = (shapes_pos[:, 1] - 1.0)[:, None, None]
    u = coords_2d_roi[..., 0]
    u = jnp.where(flip_pos[:, None, None], u_mirror - u, u)
    u = (u + crop[:, 0, None, None]) / scale[:, 1, None, None]
    v = (coords_2d_roi[..., 1] + crop[:, 1, None, None]) \
        / scale[:, 0, None, None]
    coords_2d_roi = jnp.stack([u, v], -1)
    pose_gt = pos_gt_3d[:, 3:7]                   # [x, y, z, ry]
    if cfg.projection_head.distance_mode == "z-depth":
        distances = pos_gt_3d[:, 5:6]
    else:
        distances = jnp.linalg.norm(pos_gt_3d[:, 3:6], axis=1, keepdims=True)

    coords_2d_proj = project_points(
        coords_3d, pose_gt, cams_pos, shapes_pos,
        z_min=cfg.projection_head.z_min,
        allowed_border=cfg.projection_head.allowed_border,
    )
    proj_coder = ProjErrorCoder(
        cfg.projection_head.ref_length, cfg.projection_head.ref_focal_y,
        cfg.projection_head.target_std,
    )
    proj_error = proj_coder.encode(coords_2d_proj - coords_2d_roi, distances)
    w_proj = jnp.broadcast_to(
        flat_pos_valid[:, None, None, None], proj_error.shape
    ).astype(jnp.float32)
    loss_proj, new_ema = robust_kl_loss(
        proj_error, 0, proj_logstd_enc, loss_ema,
        weight=w_proj, momentum=cfg.projection_head.loss_momentum,
        training=True,
    )
    losses["loss_proj"] = loss_proj * cfg.projection_head.loss_weight

    # ---- pose (PnP, no grad) + calibration loss ---------------------------
    proj_logstd_dec = proj_coder.decode_logstd(
        proj_logstd_enc, None, distances
    )
    istd = jnp.exp(-proj_logstd_dec) / cfg.pose_head.std_scale
    border = cfg.pose_head.allowed_border
    npos = B * P
    u_range = jnp.stack(
        [jnp.full((npos,), -border), shapes_pos[:, 1] + border], -1
    )
    v_range = jnp.stack(
        [jnp.full((npos,), -border), shapes_pos[:, 0] + border], -1
    )
    roi_heights = coords_2d_roi[:, -1, 0, 1] - coords_2d_roi[:, 0, 0, 1]
    pnp = pnp_uncert(
        coords_2d_roi.reshape(npos, dsz * dsz, 2),
        istd.reshape(npos, dsz * dsz, 2),
        jax.lax.stop_gradient(coords_3d).reshape(npos, dsz * dsz, 3),
        cams_pos, u_range, v_range,
        ransac_thr=cfg.pose_head.epnp_ransac_thres_ratio * roi_heights,
        rng=rng_pnp,
        cfg=PnPConfig(
            z_min=cfg.pose_head.z_min,
            istd_thres=cfg.pose_head.epnp_istd_thres,
            inlier_opt_only=cfg.pose_head.inlier_opt_only,
            ransac_hypotheses=cfg.pose_head.ransac_hypotheses,
            lm_iters=cfg.pose_head.lm_iters,
                exact_hessian=cfg.pose_head.forward_exact_hessian,
        ),
    )
    # sanitize the (stop-gradient) covariance BEFORE calibration: the
    # calibration jacobian d(s^2 * cov)/d logscale carries the raw cov
    # VALUE, so an inf entry turns the logscale gradient NaN even on
    # rows whose loss weight is zero
    pc0 = pnp.pose_cov
    npos_cov = pc0.shape[0]
    pc_ok = (
        jnp.all(jnp.isfinite(pc0.reshape(npos_cov, -1)), axis=-1)
        & jnp.all(jnp.abs(pc0.reshape(npos_cov, -1)) < 1e18, axis=-1)
    )
    pose_cov_safe = jnp.where(pc_ok[:, None, None], pc0, jnp.eye(4))
    pose_cov_calib = self.calibrated_cov(pose_cov_safe)
    pose_ok = pnp.valid & flat_pos_valid & pc_ok

    # score TARGETS are computed on detached predictions (the reference
    # builds them under no_grad, mlp_score_head.py:124-129 /
    # iou3d_balanced_sampler.py): dims carries gradients, and
    # differentiating the rotated-IoU polygon clipping produces NaN
    # gradients on degenerate geometry (arctan2(0, 0), zero-area
    # intersections) that poison the whole parameter tree
    ious = bbox3d_overlaps_aligned(
        pos_gt_3d[:, jnp.asarray([3, 4, 5, 0, 1, 2, 6])],
        jax.lax.stop_gradient(
            jnp.concatenate([pnp.t_vec, dims, pnp.yaw], axis=1)
        ),
    )
    ious = jnp.where(pose_ok, ious, 0.0)
    losses["mean_iou"] = jnp.sum(
        ious * flat_pos_valid
    ) / jnp.clip(jnp.sum(flat_pos_valid), 1, None)

    # loss_calib: weight 0 until the loss_schedule enables it (the generic
    # LossUpdaterHook equivalent applies config swaps in the train loop and
    # re-specialises this step; see config.LossScheduleEntry)
    yaw_diff = (pnp.yaw[:, 0] - pose_gt[:, 3] + jnp.pi) % (2 * jnp.pi) - jnp.pi
    # clip the (stop-gradient) pose error: a garbage-but-finite t_vec on a
    # weight-0 row still enters the KL gradient as diff (x) diff, which
    # overflows f32 and NaNs the logscale gradient via 0 * inf
    diff = jnp.clip(
        jnp.concatenate(
            [yaw_diff[:, None], pnp.t_vec - pose_gt[:, :3]], axis=1
        ),
        -1e6, 1e6,
    )
    from ..ops.linalg_small import spd_inverse

    # degenerate covariances must be replaced BEFORE the inverse, decided
    # on stop_gradient values: a masked-out loss row still differentiates
    # spd_inverse at the bad matrix (d inv/d logscale), and one NaN
    # gradient leaf poisons every parameter through the global-norm clip
    cc0 = jax.lax.stop_gradient(pose_cov_calib)
    ncal = cc0.shape[0]
    cov_ok = (
        jnp.all(jnp.isfinite(cc0.reshape(ncal, -1)), axis=-1)
        & jnp.all(jnp.abs(cc0.reshape(ncal, -1)) < 1e18, axis=-1)
    )
    safe_cov = jnp.where(cov_ok[:, None, None], pose_cov_calib, 0.0)
    inv_cov = spd_inverse(safe_cov + jnp.eye(4))
    losses["loss_calib"] = (
        kl_loss_mv(
            jax.lax.stop_gradient(diff), 0, inv_cov,
            weight=(pose_ok & cov_ok)[:, None].astype(jnp.float32),
        )
        * cfg.pose_head.loss_calib_weight
    )

    # ---- score head --------------------------------------------------------
    score_cov = pose_cov_calib if tr.calib_scoring else pnp.pose_cov
    logits = self.score_head(
        gout.reg_fc_out, pnp.yaw, pnp.t_vec, score_cov, dims,
        train=True, valid=pose_ok,
    )
    targets = score_targets(cfg.score_head, ious)
    samp_w = iou3d_balanced_sample_weights(
        cfg.score_head, ious, rng_score, valid=pose_ok
    )
    samp_w = samp_w / jnp.clip(jnp.mean(samp_w), 1e-2, None)
    losses["loss_score"] = sigmoid_bce_loss(
        logits[:, None], targets[:, None], weight=samp_w[:, None],
        avg_factor=jnp.sum(pose_ok),
    )

    # debug knob: MONORUN_DISABLE_LOSSES="loss_a,loss_b" excludes terms
    # from the optimized total (metrics still report them) — used to
    # bisect non-finite-gradient sources without touching configs
    import os as _os

    _disabled = set(
        filter(None, _os.environ.get("MONORUN_DISABLE_LOSSES", "").split(","))
    )
    total = sum(
        v for k, v in losses.items()
        if k.startswith("loss") and k not in _disabled
    )
    return total, (losses, new_ema)


MonoRUn.train_forward = _train_forward


def _fast_init_variables(
    model: "MonoRUn", rng: Array, image_shape, chunks: int = 8
):
    """Structural init that never compiles the forward graph.

    ``jax.jit(model.init)`` compiles the ENTIRE inference program just to
    materialise parameters — measured 250-720 s cold through the remote
    TPU tunnel (tools/cold_profile.py), dominating every cold start. This
    path instead gets the variable tree abstractly via ``eval_shape``
    (pure tracing, no compile) and materialises leaves with one tiny
    jitted program reproducing the model's initializer rules: kernels are
    lecun_normal (the flax default used everywhere here), biases/means
    zero, scales/vars one, and the NOC head's ``latent_decoder`` kernel
    zero (its documented identity-start init, models/noc_head.py).

    Init RNG streams differ from the traced init (leaf-indexed fold_in vs
    flax's per-module folding), so individual draws differ while the
    distributions match. Use for serving (checkpoints overwrite values)
    and benchmarks; training entry points keep the traced init.
    """
    h, w = image_shape
    abstract = jax.eval_shape(
        model.init,
        {"params": rng},
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 3, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 2), jnp.float32),
        jax.random.PRNGKey(0),
    )
    flat, treedef = jax.tree_util.tree_flatten_with_path(abstract)

    # one flat normal draw per CHUNK feeds that chunk's kernels (per-leaf
    # fold_in/threefry setups made the build program itself expensive to
    # compile); each kernel slice is scaled to lecun std = 1/sqrt(fan_in).
    # Plain normal instead of flax's truncated normal — statistically
    # equivalent for serving/bench purposes (checkpoints overwrite values
    # anyway). The build is split into ``chunks`` independent programs
    # compiled in parallel threads: ONE whole-tree build program measured
    # 110-250 s cold through the remote-TPU tunnel (the single largest
    # cold-start item after the kernel warm-up landed), while the chunked
    # compiles overlap on the compile service.
    def chunk_leaves(sub):
        sizes, offs = [], []
        off = 0
        for path, sds in sub:
            names = [str(getattr(p, "key", p)) for p in path]
            is_kernel = (
                names[-1] == "kernel" and len(sds.shape) >= 2
                and "latent_decoder" not in names
            )
            offs.append(off)
            n = int(np.prod(sds.shape)) if is_kernel else 0
            sizes.append(n)
            off += n
        total = max(off, 1)

        def build(key):
            pool = jax.random.normal(key, (total,), jnp.float32)
            leaves = []
            for (path, sds), o, n in zip(sub, offs, sizes):
                names = [str(getattr(p, "key", p)) for p in path]
                last = names[-1]
                if n > 0:
                    fan_in = int(np.prod(sds.shape[:-1]))
                    v = (
                        pool[o : o + n].reshape(sds.shape)
                        / np.sqrt(float(fan_in))
                    ).astype(sds.dtype)
                elif last in ("scale", "var"):
                    v = jnp.ones(sds.shape, sds.dtype)
                else:  # bias / mean / zero-init kernels / EMA scalars
                    v = jnp.zeros(sds.shape, sds.dtype)
                leaves.append(v)
            return tuple(leaves)

        return build

    chunks = max(1, min(chunks, len(flat)))
    bounds = [
        (len(flat) * c) // chunks for c in range(chunks + 1)
    ]
    spans = [
        (bounds[c], bounds[c + 1])
        for c in range(chunks) if bounds[c] < bounds[c + 1]
    ]
    builders = [
        jax.jit(chunk_leaves(flat[a:b])) for a, b in spans
    ]

    import concurrent.futures as _fut

    with _fut.ThreadPoolExecutor(max_workers=len(builders)) as ex:
        parts = list(
            ex.map(
                lambda ib: ib[1](jax.random.fold_in(rng, ib[0])),
                enumerate(builders),
            )
        )
    leaves = [leaf for part in parts for leaf in part]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def init_detector(
    cfg: MonoRUnConfig, rng: Array, image_shape: Tuple[int, int],
    fast: bool = False,
):
    """Initialise variables with a dummy batch. Returns (model, variables).

    ``fast=True`` skips compiling the forward program (see
    ``_fast_init_variables``) — use for serving and benchmarks; training
    keeps the traced flax init (exact initializer semantics).
    """
    model = MonoRUn(cfg)
    if fast:
        return model, _fast_init_variables(model, rng, image_shape)
    h, w = image_shape
    # jit the init: unjitted tracing dispatches thousands of individual ops
    # (prohibitive over a remote-device tunnel); one compiled program is fast
    variables = jax.jit(model.init)(
        {"params": rng},
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.eye(3)[None],
        jnp.asarray([[float(h), float(w)]]),
        jax.random.PRNGKey(0),
    )
    return model, variables
