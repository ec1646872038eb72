"""CARAFE content-aware 2x upsampling in pure XLA.

Re-implements mmcv's CARAFEPack CUDA op (bound in the NOC decoder,
fcn_noc_decoder.py:121-124; config upsample_cfg type='carafe',
up_kernel=5, encoder_kernel=3, compressed_channels=64, scale=2):

1. a 1x1 conv compresses channels,
2. a 3x3 conv predicts ``scale^2 * k_up^2`` reassembly kernels per input
   position, softmax-normalised over the k_up^2 window,
3. each upsampled output pixel is the kernel-weighted sum of the k_up x
   k_up input neighborhood around its source position.

Step 3 is VPU-bound (per-position kernels — no shared operand, so no
MXU): it is expressed as k_up^2 shift-multiply-accumulate terms, which
XLA fuses into one pass over the output with no (N, H, W, k^2, C) patch
tensor in HBM. Measured on v5e this is ~1.4x faster than the
patch-extraction + einsum form (which materialises ~2 GB of patches at
inference shapes) and ~1.2x faster than a hand-written Pallas kernel
(whose k_x-shifted tile reads land on misaligned sublanes).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def carafe(features: Array, kernels: Array, k_up: int, scale: int) -> Array:
    """Reassembly: features (N, H, W, C), kernels (N, H, W, s*s, k*k).

    Returns (N, s*H, s*W, C).
    """
    n, h, w, c = features.shape
    pad = (k_up - 1) // 2
    xp = jnp.pad(features, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = None
    for ky in range(k_up):
        for kx in range(k_up):
            xk = xp[:, ky : ky + h, kx : kx + w, :]    # (N, H, W, C)
            kk = kernels[..., ky * k_up + kx]          # (N, H, W, s2)
            term = kk[..., None] * xk[..., None, :]    # (N, H, W, s2, C)
            out = term if out is None else out + term
    # depth-to-space: s*s ordered (sy, sx)
    s = scale
    out = out.reshape(n, h, w, s, s, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * s, w * s, c)
    return out


class CARAFEPack(nn.Module):
    channels: int
    scale: int = 2
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        comp = nn.Conv(self.compressed_channels, (1, 1), dtype=self.dtype,
                       name="channel_compressor")(x)
        enc = nn.Conv(
            self.scale * self.scale * self.up_kernel * self.up_kernel,
            (self.encoder_kernel, self.encoder_kernel),
            padding=(self.encoder_kernel - 1) // 2,
            dtype=self.dtype,
            name="content_encoder",
        )(comp)                                        # (N, H, W, s2*k2)
        n, h, w, _ = enc.shape
        k2 = self.up_kernel * self.up_kernel
        s2 = self.scale * self.scale
        # mmcv pixel-shuffles (s2*k2) with k2-major layout: [k2, sy, sx]
        kern = enc.reshape(n, h, w, k2, s2)
        kern = jnp.moveaxis(kern, -1, -2)              # (N, H, W, s2, k2)
        kern = jax.nn.softmax(kern, axis=-1)
        return carafe(x, kern, self.up_kernel, self.scale)
