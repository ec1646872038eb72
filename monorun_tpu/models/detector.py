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

from ..coders import DimCoder, NOCCoder, ProjErrorCoder
from ..config import MonoRUnConfig
from ..ops.nms import NEG_INF, nms_rotated_bev
from ..ops.pnp import PnPConfig, pnp_uncert
from ..ops.roi_align import multilevel_roi_align, roi_grid_centers
from .bbox_head import BBoxHead, get_det_bboxes
from .fpn import FPNplus
from .global_head import GlobalHead, slice_pred
from .noc_head import NOCHead
from .resnet import ResNet
from .rpn import RPNHead, get_proposals
from .score_head import ScoreHead

Array = jnp.ndarray


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
        cfg = self.cfg
        tc = cfg.test
        B = images.shape[0]
        M = tc.max_per_img
        pad_shape = (images.shape[1], images.shape[2])

        feats = self.extract_feats(images)
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
        roi_feats = multilevel_roi_align(
            feats[: len(cfg.bbox_head.featmap_strides)], rois,
            cfg.bbox_head.featmap_strides, (7, 7),
            finest_scale=cfg.bbox_head.finest_scale,
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
        flat_labels = det_labels.reshape(B * M)
        det_batch = jnp.repeat(jnp.arange(B, dtype=det_boxes.dtype), M)
        det_rois = jnp.concatenate(
            [det_batch[:, None], det_boxes.reshape(B * M, 4)], axis=1
        )

        # ---- global head (factored MC dropout) ---------------------------
        rng_mc, rng_pnp = jax.random.split(rng)
        reg_feats = multilevel_roi_align(
            feats[: len(cfg.bbox_head.featmap_strides)], det_rois,
            cfg.bbox_head.featmap_strides, (7, 7),
            finest_scale=cfg.bbox_head.finest_scale,
        )
        gout = self.global_head(reg_feats, train=False, rng=rng_mc)
        dim_enc, dim_var_enc, latent, latent_var = slice_pred(
            cfg.global_head, gout.dim_latent_pred, gout.dim_latent_var,
            flat_labels,
        )
        dim_coder = DimCoder(cfg.global_head.dim_means, cfg.global_head.dim_stds)
        dims, dims_var = dim_coder.decode(dim_enc, dim_var_enc, flat_labels)

        # ---- NOC head -----------------------------------------------------
        noc_feats = multilevel_roi_align(
            feats[: len(cfg.noc_head.featmap_strides)], det_rois,
            cfg.noc_head.featmap_strides,
            (cfg.noc_head.roi_size, cfg.noc_head.roi_size),
            finest_scale=cfg.noc_head.finest_scale,
        )
        flip = jnp.zeros((B * M,), bool)
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
        shapes_per_det = jnp.repeat(img_shapes, M, axis=0)      # (BM, 2)
        border = cfg.pose_head.allowed_border
        u_range = jnp.stack(
            [jnp.full((B * M,), -border), shapes_per_det[:, 1] + border], -1
        )
        v_range = jnp.stack(
            [jnp.full((B * M,), -border), shapes_per_det[:, 0] + border], -1
        )
        roi_heights = coords_2d_roi[:, -1, 0, 1] - coords_2d_roi[:, 0, 0, 1]
        ransac_thr = cfg.pose_head.epnp_ransac_thres_ratio * roi_heights

        cams_per_det = jnp.repeat(cam_intrinsic, M, axis=0)
        pnp = pnp_uncert(
            coords_2d_roi.reshape(B * M, n_pts, 2),
            istd.reshape(B * M, n_pts, 2),
            coords_3d.reshape(B * M, n_pts, 3),
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
            det_scores.reshape(B * M) * scores_3d
            if tc.mult_2d_score
            else scores_3d
        )
        final_scores = jnp.where(det_valid.reshape(B * M), final_scores, 0.0)

        bboxes_3d = jnp.concatenate(
            [dims, pnp.t_vec, pnp.yaw, final_scores[:, None]], axis=1
        ).reshape(B, M, 8)

        # ---- per-class rotated-BEV 3D NMS ---------------------------------
        def _nms3d_single(b3d, labels_i, valid_i):
            bev = b3d[:, jnp.asarray([3, 5, 0, 2, 6])]   # x, z, l, w, ry
            keep = jnp.zeros((M,), bool)
            for c in range(cfg.bbox_head.num_classes):
                s = jnp.where(
                    (labels_i == c) & valid_i, b3d[:, 7], NEG_INF
                )
                idx, v = nms_rotated_bev(bev, s, tc.nms_3d_thr, M)
                keep = keep | jnp.zeros((M,), bool).at[idx].set(v)
            return keep

        keep3d = jax.vmap(_nms3d_single)(
            bboxes_3d, det_labels, det_valid
        )
        final_valid = det_valid & keep3d & pnp.valid.reshape(B, M)

        extras: Dict[str, Array] = {}
        if tc.debug:
            extras = dict(
                oc_maps=coords_3d.reshape(B, M, dsz, dsz, 3),
                std_maps=jnp.exp(proj_logstd).reshape(B, M, dsz, dsz, 2),
                latent_vecs=latent.reshape(B, M, -1),
            )

        return Detections(
            bboxes_2d=det_boxes,
            scores_2d=det_scores,
            labels=det_labels,
            bboxes_3d=bboxes_3d,
            valid=final_valid,
            pose_cov=pose_cov_calib.reshape(B, M, 4, 4),
            extras=extras,
        )


def init_detector(
    cfg: MonoRUnConfig, rng: Array, image_shape: Tuple[int, int]
):
    """Initialise variables with a dummy batch. Returns (model, variables)."""
    model = MonoRUn(cfg)
    h, w = image_shape
    variables = model.init(
        {"params": rng},
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.eye(3)[None],
        jnp.asarray([[float(h), float(w)]]),
        jax.random.PRNGKey(0),
    )
    return model, variables
