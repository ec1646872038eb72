"""CARAFE content-aware 2x upsampling in pure XLA.

Re-implements mmcv's CARAFEPack CUDA op (bound in the NOC decoder,
fcn_noc_decoder.py:121-124; config upsample_cfg type='carafe',
up_kernel=5, encoder_kernel=3, compressed_channels=64, scale=2):

1. a 1x1 conv compresses channels,
2. a 3x3 conv predicts ``scale^2 * k_up^2`` reassembly kernels per input
   position, softmax-normalised over the k_up^2 window,
3. each upsampled output pixel is the kernel-weighted sum of the k_up x
   k_up input neighborhood around its source position.

Step 3 is patch extraction (an im2col convolution — the TPU conv
emitter produces it in a conv-canonical layout) followed by one einsum
whose output dimension order is already the depth-to-space order, so
the final reshape is contiguous. Formulation chosen by measuring each
variant WITH its consumer: a k^2-term shift-multiply-accumulate loop
looks faster standalone (9 vs 13 ms summed to a scalar) but poisons the
following 3x3 conv's input layout — carafe+conv measured 17.9 ms fused
vs 9.3 ms for this form at inference shapes (N=400) on v5e. A Pallas
kernel loses similarly (misaligned sublane reads on the k_x shifts).
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

    Patch extraction is 25 shifted slices stacked on a new taps axis —
    ``conv_general_dilated_patches`` lowers to a REAL convolution with a
    (k2*C, C) one-hot filter, i.e. k2x a normal conv's MXU work (~2.6
    TFLOP-equivalent at inference shapes) just to move data; the slice
    stack is pure copies. Taps are (ky-major, kx) matching F.unfold's
    [c, ky, kx] enumeration (mmcv carafe semantics).
    """
    n, h, w, c = features.shape
    s = scale
    k2 = k_up * k_up
    p = k_up // 2
    fpad = jnp.pad(features, ((0, 0), (p, p), (p, p), (0, 0)))
    patches = jnp.stack(
        [
            fpad[:, dy:dy + h, dx:dx + w, :]
            for dy in range(k_up)
            for dx in range(k_up)
        ],
        axis=3,
    )                                # (N, H, W, k2, C), lanes stay on C
    # kernel pre-split (N,H,sy,W,sx,k2) so the einsum output is emitted in
    # depth-to-space order and the final reshape merges adjacent axes;
    # kernels follow the feature dtype (bf16 serving path stays bf16)
    kern = kernels.reshape(n, h, w, s, s, k2).transpose(0, 1, 3, 2, 4, 5)
    out = jnp.einsum(
        "nhawbk,nhwkc->nhawbc", kern.astype(features.dtype), patches
    )
    return out.reshape(n, h * s, w * s, c)


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
