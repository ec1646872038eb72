"""RPN head + fixed-shape proposal generation.

The reference uses mmdet's RPNHead starting at FPN level 1 (stride 4)
(models/dense_heads/rpn_head.py:6-13). Proposal generation follows mmdet
v2 semantics: per-level top-k, delta decode, clip, per-level NMS via the
level-offset trick (nms_across_levels=False), then global top nms_post —
all with static shapes and validity masks.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import RPNConfig
from ..ops.box_coder import delta_decode, multilevel_anchors
from ..ops.nms import NEG_INF, nms

Array = jnp.ndarray


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 cls/reg heads applied to each level."""

    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]) -> Tuple[List[Array], List[Array]]:
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="rpn_conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name="rpn_reg")
        cls_scores, bbox_preds = [], []
        for f in feats:
            x = nn.relu(conv(f.astype(self.dtype)))
            cls_scores.append(cls(x))
            bbox_preds.append(reg(x))
        return cls_scores, bbox_preds


def get_proposals(
    cls_scores: Sequence[Array],    # per level (B, H, W, A) logits
    bbox_preds: Sequence[Array],    # per level (B, H, W, A*4)
    cfg: RPNConfig,
    img_shape: Tuple[int, int],     # static padded (H, W)
    nms_pre: int,
    nms_post: int,
    valid_shapes: Array | None = None,  # (B, 2) true (h, w) per image
) -> Tuple[Array, Array]:
    """Returns (proposals (B, nms_post, 4), valid (B, nms_post))."""
    B = cls_scores[0].shape[0]
    feat_sizes = [(s.shape[1], s.shape[2]) for s in cls_scores]
    anchors = multilevel_anchors(
        feat_sizes, cfg.anchors.strides, cfg.anchors.scales,
        cfg.anchors.ratios,
    )

    all_boxes, all_scores = [], []
    for lvl, (score, pred, anc) in enumerate(
        zip(cls_scores, bbox_preds, anchors)
    ):
        s = score.reshape(B, -1)                      # (B, HWA) logits
        p = pred.reshape(B, -1, 4)
        k = min(nms_pre, s.shape[1])
        top_s, top_i = jax.lax.top_k(s, k)
        top_anc = anc[top_i]                          # (B, k, 4)
        top_p = jnp.take_along_axis(p, top_i[..., None], axis=1)
        boxes = delta_decode(
            top_anc, top_p, cfg.target_means, cfg.target_stds,
            max_shape=img_shape,
        )
        all_boxes.append(boxes)
        all_scores.append(top_s)

    # per-level NMS on the level's own top-k set: levels never suppress
    # each other (mmdet nms_across_levels=False), so one offset-trick NMS
    # over the concatenated ~4.4k candidates wastes a (4096, 4096)
    # suppression matrix where five (1000, 1000) ones do the same work
    # (~3.4x fewer pairs) — and needs no pre-NMS candidate cap at all
    all_props, all_pscores = [], []
    for boxes, scores in zip(all_boxes, all_scores):
        # degenerate-box filter
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        ok = (w > cfg.min_bbox_size) & (h > cfg.min_bbox_size)
        if valid_shapes is not None:
            # drop boxes fully inside the zero padding region
            ok = ok & (boxes[..., 0] < valid_shapes[:, None, 1]) & (
                boxes[..., 1] < valid_shapes[:, None, 0]
            )
        scores = jnp.where(ok, scores, NEG_INF)
        max_out = min(nms_post, boxes.shape[1])

        def _single(bx, sc):
            keep_idx, keep_valid = nms(
                bx, sc, cfg.nms_thr, max_out, exact=False,
                fixpoint_iters=16,
            )
            return bx[keep_idx], jnp.where(keep_valid, sc[keep_idx], NEG_INF)

        pb, ps = jax.vmap(_single)(boxes, scores)
        all_props.append(pb)
        all_pscores.append(ps)

    boxes = jnp.concatenate(all_props, axis=1)        # (B, sum(k_l), 4)
    scores = jnp.concatenate(all_pscores, axis=1)
    # global top nms_post across levels by score
    top_s, top_i = jax.lax.top_k(scores, min(nms_post, scores.shape[1]))
    props = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
    valid = top_s > NEG_INF / 2
    return props, valid


