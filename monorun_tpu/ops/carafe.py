"""CARAFE content-aware 2x upsampling in pure XLA.

Re-implements mmcv's CARAFEPack CUDA op (bound in the NOC decoder,
fcn_noc_decoder.py:121-124; config upsample_cfg type='carafe',
up_kernel=5, encoder_kernel=3, compressed_channels=64, scale=2):

1. a 1x1 conv compresses channels,
2. a 3x3 conv predicts ``scale^2 * k_up^2`` reassembly kernels per input
   position, softmax-normalised over the k_up^2 window,
3. each upsampled output pixel is the kernel-weighted sum of the k_up x
   k_up input neighborhood around its source position.

Step 3 maps to one patch-extraction + einsum: XLA fuses the (N, H, W,
k^2, C) patch tensor into the contraction instead of materialising it in
HBM, which is exactly what the hand-written CUDA kernel does.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def extract_patches(x: Array, k: int) -> Array:
    """(N, H, W, C) -> (N, H, W, k*k, C) same-padded neighborhoods."""
    n, h, w, c = x.shape
    # conv_general_dilated_patches operates NCHW-style feature grouping
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(k, k),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, H, W, C * k * k) ordered channel-major: [c, ky, kx]
    patches = patches.reshape(n, h, w, c, k * k)
    return jnp.moveaxis(patches, -2, -1)  # (N, H, W, k*k, C)


def carafe(features: Array, kernels: Array, k_up: int, scale: int) -> Array:
    """Reassembly: features (N, H, W, C), kernels (N, H, W, s*s, k*k).

    Returns (N, s*H, s*W, C).
    """
    n, h, w, c = features.shape
    patches = extract_patches(features, k_up)          # (N, H, W, k2, C)
    out = jnp.einsum("nhwsk,nhwkc->nhwsc", kernels, patches)
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
