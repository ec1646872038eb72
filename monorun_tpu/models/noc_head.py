"""Dense NOC decoder: 14x14 RoI features -> 28x28 NOC + aleatoric log-std.

Mirrors fcn_noc_decoder.py: optional Dropout2d, three 3x3 convs, additive
latent-vector injection through a zero-initialised linear, CARAFE 2x
upsample, one post-upsample conv, and a final 1x1 conv producing per-class
(3 NOC + 2 logstd) channels duplicated for flip correction — the duplicate
bank is selected per RoI by its flip flag (fcn_noc_decoder.py:225-240),
vectorised here instead of branching on a Python bool.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import NOCHeadConfig
from ..ops.carafe import CARAFEPack

Array = jnp.ndarray


class NOCHeadOutput(NamedTuple):
    noc_pred: Array       # (n, 28, 28, 3)
    proj_logstd: Array    # (n, 28, 28, 2)


class _SlicedConvFinal(nn.Module):
    """Final 1x1 conv with the class/flip-bank selection folded into the
    WEIGHTS.

    Computing all ``2 banks x classes x (3+2)`` output channels and then
    selecting per RoI (fcn_noc_decoder.py:150-152, :225-235, :242-267)
    wastes ~6x the matmul work and forces a lane-starved (n, 28, 28, 30)
    intermediate (profiled at 1.96 ms/step of the batch-4 pipeline).
    Selecting the (C_in, 3)/(C_in, 2) weight slices per RoI first — a 0/1
    mask contraction, so the selection is exact — is mathematically
    identical. The param tree matches nn.Conv ("conv_final/{kernel,bias}")
    so reference checkpoints convert unchanged.
    """

    cfg: NOCHeadConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, labels: Array, flip: Array
    ) -> Tuple[Array, Array]:
        c = self.cfg
        ncls = 1 if c.class_agnostic else c.num_classes
        nb = 2 if c.flip_correction else 1
        nc_ch, std_ch = c.noc_channels, c.uncert_channels
        per_bank = (nc_ch + std_ch) * ncls
        out_ch = per_bank * nb
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, cin, out_ch), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (out_ch,), jnp.float32
        )
        # channel order: [bank][noc class-major 3*ncls][logstd 2*ncls]
        k = kernel.reshape(cin, nb, per_bank).astype(x.dtype)
        b = bias.reshape(nb, per_bank).astype(x.dtype)
        kn = k[:, :, : nc_ch * ncls].reshape(cin, nb, ncls, nc_ch)
        ks = k[:, :, nc_ch * ncls:].reshape(cin, nb, ncls, std_ch)
        bn = b[:, : nc_ch * ncls].reshape(nb, ncls, nc_ch)
        bs = b[:, nc_ch * ncls:].reshape(nb, ncls, std_ch)
        # per-RoI (bank, class) 0/1 mask; select-reduce, no gathers
        bank = jnp.where(flip, nb - 1, 0)
        bsel = jnp.arange(nb) == bank[:, None]             # (n, nb)
        if c.class_agnostic:
            csel = jnp.ones((labels.shape[0], 1), bool)
        else:
            csel = labels[:, None] == jnp.arange(ncls)     # (n, ncls)
        m = (bsel[:, :, None] & csel[:, None, :]).astype(x.dtype)
        wn = jnp.einsum("nbc,ibcf->nif", m, kn)            # (n, cin, 3)
        ws = jnp.einsum("nbc,ibcf->nif", m, ks)            # (n, cin, 2)
        bnn = jnp.einsum("nbc,bcf->nf", m, bn)
        bss = jnp.einsum("nbc,bcf->nf", m, bs)
        noc = jnp.einsum("nhwi,nif->nhwf", x, wn) + bnn[:, None, None, :]
        logstd = jnp.einsum("nhwi,nif->nhwf", x, ws) + bss[:, None, None, :]
        return noc, logstd


class NOCHead(nn.Module):
    cfg: NOCHeadConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        roi_feats: Array,        # (n, 14, 14, C)
        latent: Array,           # (n, L)
        labels: Array,           # (n,) int
        flip: Array,             # (n,) bool
        train: bool,
        rng: Optional[Array] = None,
    ) -> NOCHeadOutput:
        c = self.cfg
        n = roi_feats.shape[0]
        x = roi_feats.astype(self.dtype)

        if train and c.dropout2d_rate > 0:
            assert rng is not None
            keep = 1.0 - c.dropout2d_rate
            mask = jax.random.bernoulli(
                rng, keep, (n, 1, 1, x.shape[-1])
            ).astype(self.dtype)
            x = x * mask / keep

        for i in range(c.num_convs):
            x = nn.relu(
                nn.Conv(c.conv_out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name=f"conv{i}")(x)
            )

        # additive latent injection (zero-init so it starts as identity)
        deform = nn.Dense(
            c.conv_out_channels, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="latent_decoder",
        )(latent.astype(self.dtype))
        x = x + deform[:, None, None, :]

        if c.dense_size > c.roi_size:
            x = CARAFEPack(
                channels=c.conv_out_channels,
                scale=2,
                up_kernel=c.carafe_up_kernel,
                encoder_kernel=c.carafe_encoder_kernel,
                compressed_channels=c.carafe_compressed_channels,
                dtype=self.dtype,
                name="upsample",
            )(x)

            for i in range(c.num_convs_upsampled):
                x = nn.relu(
                    nn.Conv(c.conv_out_channels, (3, 3), padding=1,
                            dtype=self.dtype, name=f"conv_up{i}")(x)
                )
        # else: dense_size == roi_size (fast2 preset) — the NOC map stays
        # on the RoI grid, no CARAFE/post-conv (reference always
        # upsamples, fcn_noc_decoder.py:121-124; this cut implies
        # retraining and is AP-guarded like the other fast rungs)

        noc, logstd = _SlicedConvFinal(
            cfg=c, dtype=self.dtype, name="conv_final"
        )(x, labels, flip)
        return NOCHeadOutput(noc.astype(jnp.float32),
                             logstd.astype(jnp.float32))

    def slice_pred(
        self, pred: Array, labels: Array
    ) -> Tuple[Array, Array]:
        """Class-conditional channel slicing (fcn_noc_decoder.py:242-267)."""
        c = self.cfg
        ncls = 1 if c.class_agnostic else c.num_classes
        split = c.noc_channels * ncls
        all_noc = pred[..., :split]
        all_logstd = pred[..., split:]
        if c.class_agnostic:
            return all_noc, all_logstd
        n, h, w, _ = pred.shape
        # masked select-reduce over the class axis (VPU-exact; gathers and
        # MXU one-hot matmuls are slower / bf16-rounding respectively)
        sel = (labels[:, None] == jnp.arange(ncls))  # (n, ncls)
        m = sel[:, None, None, :, None]
        noc = all_noc.reshape(n, h, w, ncls, c.noc_channels)
        noc = jnp.sum(jnp.where(m, noc, 0.0), axis=-2)
        logstd = all_logstd.reshape(n, h, w, ncls, c.uncert_channels)
        logstd = jnp.sum(jnp.where(m, logstd, 0.0), axis=-2)
        return noc, logstd
