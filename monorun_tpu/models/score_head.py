"""MLP score head predicting 3D localisation quality.

Mirrors mlp_score_head.py: input = [yaw(1), t(3), cov lower-triangle(10),
dims(3)] normalised by a *smooth* batchnorm (EMA momentum 0.01 that always
normalises with running statistics — mlp_score_head.py:142-185), one
1024-d FC fused additively with the global head's FC feature, one 256-d FC,
scalar logit. Pose inputs are detached (stop_gradient) as in the reference.

The smooth-BN running stats live in the 'batch_stats' variable collection
and are part of checkpoint state.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ScoreHeadConfig

Array = jnp.ndarray


class BatchNormSmooth(nn.Module):
    """EMA-tracked normaliser that uses running stats even in training."""

    features: int
    momentum: float = 0.01
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self, x: Array, train: bool, valid: Optional[Array] = None
    ) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean_v = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        var_v = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )
        if train and not self.is_initializing():
            # Masked batch moments: the reference only ever sees real RoIs
            # (mlp_score_head.py:170-175, torch.var_mean unbiased); with
            # fixed-shape padding the invalid rows must not drag the EMA,
            # so denominators use sum(valid), not the padded row count.
            if valid is None:
                w = jnp.ones((x.shape[0],), x.dtype)
            else:
                w = valid.astype(x.dtype)
            n = jnp.sum(w)
            m = jnp.sum(x * w[:, None], axis=0) / jnp.clip(n, 1.0, None)
            v = jnp.sum(
                w[:, None] * (x - m) ** 2, axis=0
            ) / jnp.clip(n - 1.0, 1.0, None)
            # reference updates only when batch size > 1
            upd = (n > 1).astype(x.dtype)
            mom = self.momentum * upd
            mean_v.value = (1 - mom) * mean_v.value + mom * m
            var_v.value = (1 - mom) * var_v.value + mom * v
        out = (x - mean_v.value) / jnp.sqrt(var_v.value + self.eps)
        return out * scale + bias


class ScoreHead(nn.Module):
    cfg: ScoreHeadConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        reg_fc_out: Array,    # (n, 1024)
        yaw: Array,           # (n, 1)
        t_vec: Array,         # (n, 3)
        pose_cov: Array,      # (n, 4, 4)
        dimensions: Array,    # (n, 3)
        train: bool = False,
        valid: Optional[Array] = None,   # (n,) exclude padded rows from EMA
    ) -> Array:
        c = self.cfg
        sg = jax.lax.stop_gradient
        yaw, t_vec = sg(yaw), sg(t_vec)
        pose_cov, dimensions = sg(pose_cov), sg(dimensions)

        ix, iy = jnp.tril_indices(4)
        cov_tril = pose_cov[:, ix, iy]                   # (n, 10)
        x = jnp.concatenate([yaw, t_vec, cov_tril, dimensions], axis=1)
        if valid is not None:
            # sanitize padded rows (their values can be garbage from masked
            # PnP); EMA moments are masked inside BatchNormSmooth
            x = jnp.where(valid[:, None], x, 0.0)
        if c.use_pose_norm:
            x = BatchNormSmooth(
                17, momentum=c.pose_norm_momentum, name="pose_norm"
            )(x, train, valid=valid)
        x = x.astype(self.dtype)
        x = nn.relu(
            nn.Dense(c.pose_fc_out_channels, dtype=self.dtype,
                     name="pose_fc0")(x)
        )
        x = x + reg_fc_out.astype(self.dtype)            # additive fusion
        x = nn.relu(
            nn.Dense(c.fc_out_channels, dtype=self.dtype, name="fused_fc0")(x)
        )
        logit = nn.Dense(1, dtype=self.dtype, name="fc_out")(x)[:, 0]
        return logit.astype(jnp.float32)


def score_targets(cfg: ScoreHeadConfig, ious: Array) -> Array:
    """3D-IoU -> soft BCE target (mlp_score_head.py:124-129)."""
    if cfg.mode == "thres":
        return (ious >= cfg.iou_thres).astype(jnp.float32)
    if cfg.mode == "linear_average":
        return jnp.clip(
            cfg.linear_coefs[0] + ious * cfg.linear_coefs[1], 0.0, 1.0
        )
    return ious


def iou3d_balanced_sample_weights(
    cfg: ScoreHeadConfig, ious: Array, rng: Array,
    valid: Optional[Array] = None,
) -> Array:
    """Stochastic keep-mask balancing pos/neg score targets.

    Mirrors core/bbox_3d/samplers/iou3d_balanced_sampler.py:20-56 with a
    smooth keep-rate ramp between strong-neg and strong-pos thresholds.
    The reference's ``num_total = ious.numel()`` only ever counts real
    RoIs; with fixed-shape padding the counts must come from the valid
    mask or padded slots skew the pos/neg balance. Returns float weights
    (same shape as ious), zero on invalid slots.
    """
    thr = cfg.sampler_pos_iou_thr
    fmin, fmax = cfg.sampler_pos_fraction_min, cfg.sampler_pos_fraction_max
    vmask = (
        jnp.ones(ious.shape, bool) if valid is None else valid.astype(bool)
    )
    num_total = jnp.sum(vmask)
    pos = (ious >= thr) & vmask
    num_pos = jnp.sum(pos)
    num_neg = num_total - num_pos
    num_pos_max = fmax / (1 - fmax) * num_neg
    num_neg_max = (1 - fmin) / fmin * num_pos

    balanced = (num_pos <= num_pos_max) & (num_neg <= num_neg_max)
    pos_keep = jnp.where(num_pos > num_pos_max, num_pos_max / jnp.clip(num_pos, 1, None), 1.0)
    neg_keep = jnp.where(num_pos > num_pos_max, 1.0, num_neg_max / jnp.clip(num_neg, 1, None))
    if cfg.sampler_smooth_keeprate:
        strong_pos = (thr + 1.0) / 2.0
        strong_neg = thr / 2.0
        keeprate = (pos_keep - neg_keep) / (strong_pos - strong_neg) * (
            ious - strong_neg
        ) + neg_keep
    else:
        keeprate = jnp.where(pos, pos_keep, neg_keep)
    keeprate = jnp.where(balanced, 1.0, keeprate)
    mask = (jax.random.uniform(rng, ious.shape) < keeprate) & vmask
    return mask.astype(jnp.float32)
