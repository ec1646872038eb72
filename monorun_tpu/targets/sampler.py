"""Random pos/neg RoI sampling, fixed-shape (mmdet RandomSampler semantics).

Output layout is static: ``max_pos`` positive slots followed by
``num - max_pos`` negative slots, each with a validity flag. The reference
samples num_pos = min(#pos, num * pos_fraction) positives and fills the
remainder with negatives; with static shapes the negative count is fixed
at ``num - max_pos`` (loss averaging uses validity-weighted factors, so
the effective balance matches).

Randomised selection uses the keyed-noise top-k trick: eligible items get
uniform noise, ineligible get -inf, and top-k picks a uniform random
subset — no host RNG, fully vectorised.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .assigner import ASSIGN_NEG

Array = jnp.ndarray


class SampleResult(NamedTuple):
    pos_inds: Array        # (max_pos,) candidate indices
    pos_valid: Array       # (max_pos,) bool
    pos_boxes: Array       # (max_pos, 4)
    pos_gt_inds: Array     # (max_pos,) matched GT index (clipped >= 0)
    pos_labels: Array      # (max_pos,) GT class
    neg_inds: Array        # (num_neg,)
    neg_valid: Array       # (num_neg,)
    neg_boxes: Array       # (num_neg, 4)


def _random_topk(rng: Array, eligible: Array, k: int):
    noise = jax.random.uniform(rng, eligible.shape)
    score = jnp.where(eligible, noise, -1.0)
    vals, idx = jax.lax.top_k(score, k)
    return idx, vals >= 0.0


def sample_rois(
    rng: Array,
    boxes: Array,          # (n, 4) candidates (proposals [+ GTs])
    assigned_gt: Array,    # (n,) assignment codes
    labels: Array,         # (n,) class of matched GT
    num: int,
    pos_fraction: float,
    max_pos: int | None = None,
) -> SampleResult:
    if max_pos is None:
        max_pos = int(num * pos_fraction)
    num_neg = num - max_pos
    r_pos, r_neg = jax.random.split(rng)

    is_pos = assigned_gt >= 0
    is_neg = assigned_gt == ASSIGN_NEG
    pos_inds, pos_valid = _random_topk(r_pos, is_pos, max_pos)
    neg_inds, neg_valid = _random_topk(r_neg, is_neg, num_neg)

    return SampleResult(
        pos_inds=pos_inds,
        pos_valid=pos_valid,
        pos_boxes=boxes[pos_inds],
        pos_gt_inds=jnp.clip(assigned_gt[pos_inds], 0, None),
        pos_labels=jnp.clip(labels[pos_inds], 0, None),
        neg_inds=neg_inds,
        neg_valid=neg_valid,
        neg_boxes=boxes[neg_inds],
    )
