"""Max-IoU assignment, fixed-shape (mmdet MaxIoUAssigner semantics).

The reference binds mmdet's MaxIoUAssigner for both RPN and R-CNN
(configs/kitti_multiclass.py:148-190). Padded GT slots carry a validity
mask instead of varying array lengths; ignore boxes suppress candidates by
intersection-over-foreground.

Assignment codes (mmdet convention shifted to 0-based):
  ASSIGN_IGNORE (-2) — overlaps an ignore region, excluded from sampling
  ASSIGN_NEG    (-1) — background
  >= 0             — index of the matched GT
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..ops.nms import bbox_iof_matrix, bbox_iou_matrix

Array = jnp.ndarray

ASSIGN_IGNORE = -2
ASSIGN_NEG = -1


@dataclasses.dataclass(frozen=True)
class AssignCfg:
    pos_iou_thr: float
    neg_iou_thr: float
    min_pos_iou: float
    ignore_iof_thr: float = -1.0
    match_low_quality: bool = True


class AssignResult(NamedTuple):
    assigned_gt: Array    # (n,) int32 codes as above
    max_iou: Array        # (n,)
    labels: Array         # (n,) class of matched GT, -1 otherwise


def assign_max_iou(
    boxes: Array,          # (n, 4) candidate boxes
    boxes_valid: Array,    # (n,) bool
    gt_boxes: Array,       # (g, 4) padded
    gt_valid: Array,       # (g,) bool
    gt_labels: Array,      # (g,) int
    cfg: AssignCfg,
    ignore_boxes: Optional[Array] = None,   # (i, 4) padded
    ignore_valid: Optional[Array] = None,   # (i,) bool
) -> AssignResult:
    n = boxes.shape[0]
    iou = bbox_iou_matrix(boxes, gt_boxes)             # (n, g)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    iou = jnp.where(boxes_valid[:, None], iou, 0.0)

    max_iou = jnp.max(iou, axis=1)
    argmax_gt = jnp.argmax(iou, axis=1)

    assigned = jnp.full((n,), ASSIGN_IGNORE, jnp.int32)
    # negatives: below neg threshold
    assigned = jnp.where(max_iou < cfg.neg_iou_thr, ASSIGN_NEG, assigned)
    # positives: above pos threshold
    assigned = jnp.where(
        max_iou >= cfg.pos_iou_thr, argmax_gt.astype(jnp.int32), assigned
    )

    if cfg.match_low_quality:
        # every GT claims its best-overlapping candidate(s) when that
        # overlap >= min_pos_iou (mmdet matches ALL candidates tied at the
        # per-GT max overlap)
        gt_max = jnp.max(iou, axis=0)                  # (g,)
        is_gt_best = (iou == gt_max[None, :]) & (
            gt_max[None, :] >= cfg.min_pos_iou
        ) & gt_valid[None, :] & (iou > 0)
        # later GTs override earlier ones like mmdet's sequential loop
        g = gt_boxes.shape[0]
        claim = jnp.where(
            is_gt_best, jnp.arange(g, dtype=jnp.int32)[None, :], -1
        )
        best_claim = jnp.max(claim, axis=1)            # last (max idx) wins
        assigned = jnp.where(best_claim >= 0, best_claim, assigned)

    if (
        ignore_boxes is not None
        and ignore_valid is not None
        and cfg.ignore_iof_thr > 0
    ):
        iof = bbox_iof_matrix(boxes, ignore_boxes)
        iof = jnp.where(ignore_valid[None, :], iof, 0.0)
        hit = jnp.max(iof, axis=1, initial=0.0) >= cfg.ignore_iof_thr
        assigned = jnp.where(hit, ASSIGN_IGNORE, assigned)

    assigned = jnp.where(boxes_valid, assigned, ASSIGN_IGNORE)
    labels = jnp.where(
        assigned >= 0, gt_labels[jnp.clip(assigned, 0, None)], -1
    ).astype(jnp.int32)
    return AssignResult(assigned, max_iou, labels)
