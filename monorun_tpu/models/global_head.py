"""Global 3D head: per-RoI dimensions + latent vector with MC-dropout.

Reference behaviour (fc_extractor.py, fc_extractor_monte_carlo.py):
Dropout2d(p2d) on the 7x7 RoI feature, two 1024-d FCs with Dropout(p)
after each ReLU, and a final FC to per-class (3 dims + 16 latent). At
inference the reference replicates every RoI feature 50x through always-on
dropout and takes var/mean over the samples — 50x the FLOPs of one pass
(fc_extractor_monte_carlo.py:41-60).

**TPU redesign — factored MC sampling.** Channel dropout commutes with the
first FC: with per-channel masks m and per-channel partial products
P[n, c] = sum_hw x[n, h, w, c] * W1[c, hw, :], the pre-activation of
sample s is (1/keep) * sum_c m[s, n, c] * P[n, c]. P costs one fc1 pass;
the per-sample mixing is a tiny (S, C) x (C, F) contraction, ~49x cheaper
than re-running fc1 per sample. Sampling statistics are *identical* to
the reference (independent Bernoulli masks per sample and RoI); only the
order of summation changes.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GlobalHeadConfig

Array = jnp.ndarray


def _fast_key(key, fast: bool = True):
    """Threefry key -> rbg key for bulk mask generation.

    Threefry bit generation for the two (n, 50, 1024) MC masks profiled
    1.68 ms/step on v5e (hlo_stats fusion.177 — pure counter-mode hashing
    on the VPU); XLA's hardware RngBitGenerator behind the 'rbg' impl is
    ~10x cheaper. Deterministic in the input key; dropout masks only need
    iid Bernoulli quality, not cryptographic separation.

    DETERMINISM TRADE-OFF: JAX does not guarantee 'rbg' streams are
    stable across backends or compiler versions, so MC-dropout draws
    (and hence the aleatoric/epistemic estimates) are reproducible only
    within one stack. GlobalHeadConfig.mc_fast_rng=False keeps the
    threefry impl for bitwise cross-platform reproducibility. The four
    rbg key words are derived from the threefry key and a fold_in(1) of
    it — two independent 32-bit words each, not a duplicate."""
    if not fast:
        return key
    kd, kd2 = key, jax.random.fold_in(key, 1)
    if hasattr(key, "dtype") and jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd, kd2 = jax.random.key_data(kd), jax.random.key_data(kd2)
    return jax.random.wrap_key_data(
        jnp.concatenate([kd.reshape(-1), kd2.reshape(-1)]), impl="rbg"
    )


def _dropout_mask(key, keep: float, shape, dtype):
    """Pre-scaled {0, 1/keep} dropout mask from uint8 draws.

    bernoulli() burns one threefry WORD per element (~0.9 ms/step for the
    two (n, 50, 1024) MC masks); a uint8 draw needs a quarter word, and
    `u8 < round(keep * 256)` is an exactly-Bernoulli(keep) coin whenever
    keep is a multiple of 1/256 (p = 0.5 included). A previous variant
    unpacked raw bits with 32 shift/mask lanes per word — the shifts
    alone profiled at 1.65 ms/step, slower than what they saved. Baking
    the 1/keep rescale into the select saves a separate convert + mul +
    div chain over the (n, S, F) activations (another ~2 ms/step).
    """
    thresh = round(keep * 256.0)
    inv = jnp.asarray(1.0 / keep, dtype)
    if abs(thresh - keep * 256.0) > 1e-9 or not 0 < thresh < 256:
        return jnp.where(
            jax.random.bernoulli(key, keep, shape), inv,
            jnp.zeros((), dtype),
        )
    u8 = jax.random.bits(key, shape, jnp.uint8)
    return jnp.where(u8 < jnp.uint8(thresh), inv, jnp.zeros((), dtype))


class GlobalHeadOutput(NamedTuple):
    dim_latent_pred: Array          # (n, (3+L)*K) or (n, 3+L)
    dim_latent_var: Optional[Array]
    reg_fc_out: Array               # (n, 1024)


class GlobalHead(nn.Module):
    cfg: GlobalHeadConfig
    dtype: Any = jnp.float32

    def _out_dim(self) -> int:
        c = self.cfg
        per = 3 + c.latent_channels
        return per if c.latent_class_agnostic else per * c.num_classes

    @nn.compact
    def __call__(
        self,
        roi_feats: Array,           # (n, 7, 7, C)
        train: bool,
        rng: Optional[Array] = None,
    ) -> GlobalHeadOutput:
        c = self.cfg
        n, fh, fw, ch = roi_feats.shape
        area = fh * fw
        x = roi_feats.astype(self.dtype)

        # fc0 params are explicit so both code paths share one param tree;
        # kernel layout (C, area, F) matches the torch (C*H*W) flatten order.
        kernel0 = self.param(
            "fc0_kernel",
            nn.initializers.lecun_normal(),
            (ch * area, c.fc_out_channels),
        ).reshape(ch, area, c.fc_out_channels)
        bias0 = self.param(
            "fc0_bias", nn.initializers.zeros, (c.fc_out_channels,)
        )
        fc1 = nn.Dense(c.fc_out_channels, dtype=self.dtype, name="fc1")
        fc_reg = nn.Dense(self._out_dim(), dtype=self.dtype, name="fc_reg")

        keep2d = 1.0 - c.dropout2d_rate
        keep = 1.0 - c.dropout_rate
        assert rng is not None
        r2d, r0, r1 = jax.random.split(rng, 3)

        xt = jnp.moveaxis(x, -1, 1).reshape(n, ch, area)
        k0 = kernel0.astype(self.dtype)
        b0 = bias0.astype(self.dtype)

        if train:
            m2d = jax.random.bernoulli(r2d, keep2d, (n, ch, 1)).astype(
                self.dtype
            )
            h = jnp.einsum("nca,caf->nf", xt * m2d / keep2d, k0) + b0
            h = nn.relu(h)
            h = h * jax.random.bernoulli(r0, keep, h.shape) / keep
            h = nn.relu(fc1(h))
            h = h * jax.random.bernoulli(r1, keep, h.shape) / keep
            out = fc_reg(h)
            return GlobalHeadOutput(
                out.astype(jnp.float32), None, h.astype(jnp.float32)
            )

        # ---- inference: factored Monte-Carlo sampling --------------------
        # sample axis S kept BEHIND the RoI axis: "snc,ncf" puts the dot's
        # batch dim (n) in the middle of the lhs, which XLA lowers with a
        # relayout per operand (profiled 0.93 ms for a 10 GFLOP batched
        # matmul); (n, S, C) @ (n, C, F) is the natural batched form
        S = c.mc_samples
        P = jnp.einsum("nca,caf->ncf", xt, k0)            # (n, C, F)
        m2d = jnp.where(
            jax.random.bernoulli(_fast_key(r2d, c.mc_fast_rng), keep2d, (n, S, ch)),
            jnp.asarray(1.0 / keep2d, self.dtype),
            jnp.zeros((), self.dtype),
        )                          # pre-scaled: folds the /keep2d rescale
        pre0 = jnp.einsum("nsc,ncf->nsf", m2d, P) + b0
        h = nn.relu(pre0)                                 # (n, S, F)
        h = h * _dropout_mask(_fast_key(r0, c.mc_fast_rng), keep, h.shape, self.dtype)
        h = nn.relu(fc1(h))
        h = h * _dropout_mask(_fast_key(r1, c.mc_fast_rng), keep, h.shape, self.dtype)
        out = fc_reg(h).astype(jnp.float32)               # (n, S, D)

        mean = jnp.mean(out, axis=1)
        var = jnp.var(out, axis=1, ddof=1)                # matches torch.var
        reg_fc_out = jnp.mean(h, axis=1).astype(jnp.float32)
        return GlobalHeadOutput(mean, var, reg_fc_out)


def slice_pred(
    cfg: GlobalHeadConfig,
    dim_latent_pred: Array,
    dim_latent_var: Optional[Array],
    labels: Array,
) -> Tuple[Array, Optional[Array], Array, Optional[Array]]:
    """Select the per-class (3+L) block for each RoI's label.

    Mirrors fc_extractor.py:133-144 / fc_extractor_monte_carlo.py:63-82.
    Returns (dim, dim_var, latent, latent_var).
    """
    per = 3 + cfg.latent_channels

    def pick(arr):
        if arr is None:
            return None
        if cfg.latent_class_agnostic:
            return arr
        r = arr.reshape(arr.shape[0], -1, per)
        # masked select-reduce; tiny-axis gathers are slow on TPU
        sel = labels[:, None] == jnp.arange(r.shape[1])
        return jnp.sum(jnp.where(sel[..., None], r, 0.0), axis=1)

    p = pick(dim_latent_pred)
    v = pick(dim_latent_var)
    dim, latent = p[:, :3], p[:, 3:]
    if v is None:
        return dim, None, latent, None
    return dim, v[:, :3], latent, v[:, 3:]
