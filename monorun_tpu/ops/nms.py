"""Fixed-shape NMS kernels (axis-aligned and rotated-BEV).

Replaces the CUDA NMS paths the reference binds from mmcv/mmdet3d
(configs/kitti_multiclass.py:164-207 for 2D, monorun_roi_head.py:5,638 for
rotated 3D NMS). Two strategies:

* ``nms_greedy`` — exact sequential greedy via ``lax.fori_loop``; right for
  the small candidate sets (final detections, per-class 3D NMS).
* ``nms_fixpoint`` — the greedy keep set is the unique fixpoint of
  keep[i] = ¬∃ j<i : keep[j] ∧ iou(i,j) > thr. Iterating from all-true
  converges in (suppression-chain depth) rounds, each an MXU-friendly
  masked matrix reduction — far better than a 5000-step scalar loop for
  RPN-scale inputs. An even iteration count upper-bounds the greedy set.

All functions are jit-safe: inputs padded, invalid entries carry score -inf.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .rotated_iou import rotated_iou

Array = jnp.ndarray

NEG_INF = -1e10


def bbox_iou_matrix(boxes_a: Array, boxes_b: Array) -> Array:
    """Axis-aligned IoU matrix for (n, 4) x (k, 4) xyxy boxes."""
    area_a = jnp.clip(boxes_a[:, 2] - boxes_a[:, 0], 0, None) * jnp.clip(
        boxes_a[:, 3] - boxes_a[:, 1], 0, None
    )
    area_b = jnp.clip(boxes_b[:, 2] - boxes_b[:, 0], 0, None) * jnp.clip(
        boxes_b[:, 3] - boxes_b[:, 1], 0, None
    )
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-8, None)


def bbox_iof_matrix(boxes_a: Array, boxes_b: Array) -> Array:
    """Intersection-over-foreground (area of a), for ignore matching."""
    area_a = jnp.clip(boxes_a[:, 2] - boxes_a[:, 0], 0, None) * jnp.clip(
        boxes_a[:, 3] - boxes_a[:, 1], 0, None
    )
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.clip(area_a[:, None], 1e-8, None)


def _suppress_greedy(iou: Array, order_valid: Array, iou_thr: float) -> Array:
    """Exact greedy keep mask given a score-descending IoU matrix.

    Runs the fixpoint recurrence keep[i] = valid[i] ∧ ¬∃ j<i : keep[j] ∧
    iou(j,i) > thr to *convergence*: any fixpoint equals the greedy set
    (induction over score order — keep[0] is forced, and keep[i] is a
    function of keep[<i] only), and the iterate is exact for every chain
    depth < t after t steps, so it stabilizes in (chain depth + 1) ≤ n
    rounds. Two equal consecutive iterates ⇒ fixpoint ⇒ greedy. Each
    round is one (n, n) masked any-reduce instead of the n-step scalar
    loop (512 sequential steps ≈ 3 ms/image at detection scale; chains
    at IoU 0.5 converge in < 10 rounds).
    """
    n = iou.shape[0]
    tri = jnp.tril(jnp.ones((n, n), bool), k=-1)  # j < i strictly
    sup = (iou > iou_thr) & tri.T                 # sup[j, i]: j earlier

    def step(keep):
        killed = jnp.any(sup & keep[:, None], axis=0)
        return order_valid & ~killed

    def cond(state):
        t, prev, keep = state
        return (t <= n) & jnp.any(prev != keep)

    def body(state):
        t, _, keep = state
        return t + 1, keep, step(keep)

    _, _, kept = jax.lax.while_loop(
        cond, body, (jnp.int32(0), ~order_valid, order_valid)
    )
    return kept


def _suppress_fixpoint(
    iou: Array, order_valid: Array, iou_thr: float, iters: int
) -> Array:
    """Fixpoint iteration of the greedy recurrence (see module docstring)."""
    n = iou.shape[0]
    tri = jnp.tril(jnp.ones((n, n), bool), k=-1)  # j < i strictly
    sup = (iou > iou_thr) & tri.T                 # sup[j, i]: j earlier

    def body(_, keep):
        killed = jnp.any(sup & keep[:, None], axis=0)
        return order_valid & ~killed

    # even number of applications upper-bounds the greedy set
    keep = jax.lax.fori_loop(0, 2 * ((iters + 1) // 2), body, order_valid)
    return keep


def _nms_impl(
    iou_fn,
    boxes: Array,
    scores: Array,
    iou_thr: float,
    max_out: int,
    exact: bool,
    fixpoint_iters: int,
) -> Tuple[Array, Array]:
    n = scores.shape[0]
    order = jnp.argsort(-scores)
    valid = scores[order] > NEG_INF / 2
    # sort the (n, d) boxes FIRST, then build the IoU matrix directly in
    # score order — a [order][:, order] double gather of the (n, n)
    # matrix costs 2 random passes over n^2 floats (134 MB/img at RPN
    # scale) vs one tiny (n, d) gather here
    iou_sorted = iou_fn(boxes[order])
    if exact:
        kept = _suppress_greedy(iou_sorted, valid, iou_thr)
    else:
        kept = _suppress_fixpoint(iou_sorted, valid, iou_thr, fixpoint_iters)
    # rank kept boxes first (they're already score-sorted), take max_out
    kept_rank = jnp.where(kept, jnp.arange(n), n)
    take = jnp.argsort(kept_rank)[:max_out]
    keep_idx = order[take]
    keep_valid = kept[take]
    return keep_idx, keep_valid


def nms(
    boxes: Array,        # (n, 4) xyxy
    scores: Array,       # (n,) padded entries = NEG_INF
    iou_thr: float,
    max_out: int,
    exact: bool = True,
    fixpoint_iters: int = 12,
) -> Tuple[Array, Array]:
    """Axis-aligned NMS. Returns (keep_idx (max_out,), keep_valid (max_out,))."""
    return _nms_impl(
        lambda b: bbox_iou_matrix(b, b), boxes, scores, iou_thr, max_out,
        exact, fixpoint_iters,
    )


def nms_rotated_bev(
    boxes: Array,        # (n, 5) [x, z, l, w, ry]
    scores: Array,
    iou_thr: float,
    max_out: int,
    exact: bool = True,
    fixpoint_iters: int = 12,
) -> Tuple[Array, Array]:
    """Rotated-BEV NMS, replacing mmdet3d nms_gpu (monorun_roi_head.py:638).

    With ``exact=False``, ``fixpoint_iters`` bounds the suppression-chain
    depth the fixpoint resolves; an even application count upper-bounds
    the greedy set (extra boxes kept on deeper chains). ``fixpoint_iters
    >= n`` makes the fixpoint EXACT for any input (a chain cannot exceed
    the box count) — the serving path passes its head-slot count, which
    costs a few extra tiny (n, n) passes and removes the approximation
    (tests/test_nms.py::test_fixpoint_full_depth_chain_is_exact)."""
    return _nms_impl(
        lambda b: rotated_iou(b, b), boxes, scores, iou_thr, max_out, exact,
        fixpoint_iters,
    )


@partial(jax.jit, static_argnames=("iou_thr", "max_per_img", "pre_topk"))
def multiclass_nms(
    boxes: Array,        # (n, num_classes, 4) or (n, 4)
    scores: Array,       # (n, num_classes) — foreground only, thresholded
    iou_thr: float,
    max_per_img: int,
    pre_topk: int = 512,
) -> Tuple[Array, Array, Array, Array]:
    """Per-class NMS via the coordinate-offset trick (one NMS pass).

    Matches mmdet multiclass_nms semantics (score_thr applied by the caller
    as score = NEG_INF). Returns (det_bboxes (m, 4), det_scores (m,),
    det_labels (m,), det_valid (m,)) with m = max_per_img.
    """
    n, num_classes = scores.shape
    if boxes.ndim == 2:
        boxes = jnp.broadcast_to(boxes[:, None, :], (n, num_classes, 4))
    flat_boxes = boxes.reshape(n * num_classes, 4)
    flat_scores = scores.reshape(n * num_classes)
    flat_labels = jnp.tile(jnp.arange(num_classes), (n,))

    # cap the candidate set before the O(k^2) IoU matrix
    k = min(pre_topk, n * num_classes)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    top_boxes = flat_boxes[top_idx]
    top_labels = flat_labels[top_idx]

    # offset boxes per class so cross-class pairs never overlap
    extent = jnp.max(jnp.abs(top_boxes)) + 1.0
    offset_boxes = top_boxes + (top_labels * 2 * extent)[:, None]

    keep_idx, keep_valid = nms(
        offset_boxes, top_scores, iou_thr, max_per_img, exact=True
    )
    det_boxes = top_boxes[keep_idx]
    det_scores = jnp.where(keep_valid, top_scores[keep_idx], NEG_INF)
    det_labels = jnp.where(keep_valid, top_labels[keep_idx], -1)
    return det_boxes, det_scores, det_labels, keep_valid
