"""RPN anchor targets and losses (fixed-shape).

mmdet semantics (bound at configs/kitti_multiclass.py:146-163): MaxIoU
assign (0.7/0.3, low-quality 0.3, ignore IoF 0.5), random sample 256 at
pos_fraction 0.5, sigmoid BCE for objectness + SmoothL1(beta=1/9) on
anchor deltas, averaged by the total sampled count across the batch.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import RPNConfig, TrainCfg
from ..losses import sigmoid_bce_loss, smooth_l1_loss
from ..ops.box_coder import delta_encode, multilevel_anchors
from .assigner import AssignCfg, assign_max_iou
from .sampler import sample_rois

Array = jnp.ndarray


def rpn_loss(
    rng: Array,
    cls_scores: Sequence[Array],   # per level (B, H, W, A) logits
    bbox_preds: Sequence[Array],   # per level (B, H, W, A*4)
    gt_boxes: Array,               # (B, G, 4)
    gt_valid: Array,               # (B, G)
    ignore_boxes: Array,           # (B, I, 4)
    ignore_valid: Array,           # (B, I)
    rpn_cfg: RPNConfig,
    train_cfg: TrainCfg,
) -> Dict[str, Array]:
    B = cls_scores[0].shape[0]
    feat_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
    anchors = jnp.concatenate(
        multilevel_anchors(
            feat_sizes, rpn_cfg.anchors.strides, rpn_cfg.anchors.scales,
            rpn_cfg.anchors.ratios,
        ),
        axis=0,
    )                                              # (N, 4)
    n_anchors = anchors.shape[0]
    logits = jnp.concatenate(
        [s.reshape(B, -1) for s in cls_scores], axis=1
    )                                              # (B, N)
    deltas = jnp.concatenate(
        [p.reshape(B, -1, 4) for p in bbox_preds], axis=1
    )                                              # (B, N, 4)

    acfg = AssignCfg(
        pos_iou_thr=train_cfg.rpn_pos_iou_thr,
        neg_iou_thr=train_cfg.rpn_neg_iou_thr,
        min_pos_iou=train_cfg.rpn_min_pos_iou,
        ignore_iof_thr=train_cfg.rpn_ignore_iof_thr,
    )
    num = train_cfg.rpn_num_samples
    max_pos = int(num * train_cfg.rpn_pos_fraction)

    def per_image(rng_i, gt_b, gt_v, ig_b, ig_v):
        res = assign_max_iou(
            anchors, jnp.ones((n_anchors,), bool), gt_b, gt_v,
            jnp.zeros((gt_b.shape[0],), jnp.int32), acfg,
            ignore_boxes=ig_b, ignore_valid=ig_v,
        )
        samp = sample_rois(
            rng_i, anchors, res.assigned_gt, res.labels, num,
            train_cfg.rpn_pos_fraction, max_pos=max_pos,
        )
        pos_targets = delta_encode(
            samp.pos_boxes, gt_b[samp.pos_gt_inds],
            rpn_cfg.target_means, rpn_cfg.target_stds,
        )
        return samp.pos_inds, samp.pos_valid, pos_targets, samp.neg_inds, \
            samp.neg_valid

    rngs = jax.random.split(rng, B)
    pos_inds, pos_valid, pos_targets, neg_inds, neg_valid = jax.vmap(
        per_image
    )(rngs, gt_boxes, gt_valid, ignore_boxes, ignore_valid)

    num_total = jnp.sum(pos_valid) + jnp.sum(neg_valid)

    pos_logits = jnp.take_along_axis(logits, pos_inds, axis=1)
    neg_logits = jnp.take_along_axis(logits, neg_inds, axis=1)
    loss_cls = sigmoid_bce_loss(
        jnp.concatenate([pos_logits, neg_logits], 1),
        jnp.concatenate(
            [jnp.ones_like(pos_logits), jnp.zeros_like(neg_logits)], 1
        ),
        weight=jnp.concatenate([pos_valid, neg_valid], 1).astype(jnp.float32),
        avg_factor=num_total,
    )

    pos_deltas = jnp.take_along_axis(deltas, pos_inds[..., None], axis=1)
    loss_bbox = smooth_l1_loss(
        pos_deltas, pos_targets, beta=1.0 / 9.0,
        weight=pos_valid[..., None].astype(jnp.float32),
        avg_factor=num_total,
    )
    return dict(loss_rpn_cls=loss_cls, loss_rpn_bbox=loss_bbox)
