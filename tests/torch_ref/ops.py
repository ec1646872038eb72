"""Pure-torch replicas of the mmcv CUDA ops the reference binds.

These reproduce the exact numerical semantics of:

- mmcv ``RoIAlign(aligned=True, sampling_ratio=0)`` — the op bound at
  reference configs/kitti_multiclass.py:40,85 and called directly in
  monorun_roi_head.py:212,521 and masked_dense_target.py:39-43;
- mmcv ``CARAFEPack`` (ops/carafe.py) — the NOC decoder's 2x upsampler
  (fcn_noc_decoder.py:121-124).

They are oracles for activation-parity tests of the JAX implementations
(no mmcv/torchvision in this environment, so the semantics are
re-expressed from the mmcv CPU kernels in plain torch).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _bilinear(img: torch.Tensor, y: float, x: float) -> torch.Tensor:
    """mmcv roi_align bilinear_interpolate boundary rules. img: (C, H, W)."""
    C, H, W = img.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return img.new_zeros(C)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= H - 1:
        y_low = y_high = H - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= W - 1:
        x_low = x_high = W - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1.0 - ly, 1.0 - lx
    return (
        hy * hx * img[:, y_low, x_low]
        + hy * lx * img[:, y_low, x_high]
        + ly * hx * img[:, y_high, x_low]
        + ly * lx * img[:, y_high, x_high]
    )


def roi_align_torch(
    feats: torch.Tensor,       # (N, C, H, W)
    rois: torch.Tensor,        # (R, 5) [batch_idx, x1, y1, x2, y2]
    out_size,                  # (ph, pw)
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> torch.Tensor:
    """Reference-exact aligned RoIAlign (mmcv CPU kernel semantics)."""
    ph, pw = out_size
    R = rois.shape[0]
    C = feats.shape[1]
    out = feats.new_zeros(R, C, ph, pw)
    offset = 0.5 if aligned else 0.0
    for r in range(R):
        b = int(rois[r, 0])
        x1 = float(rois[r, 1]) * spatial_scale - offset
        y1 = float(rois[r, 2]) * spatial_scale - offset
        x2 = float(rois[r, 3]) * spatial_scale - offset
        y2 = float(rois[r, 4]) * spatial_scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = max(roi_w, 1.0)
            roi_h = max(roi_h, 1.0)
        bin_h = roi_h / ph
        bin_w = roi_w / pw
        grid_h = sampling_ratio if sampling_ratio > 0 else int(
            math.ceil(roi_h / ph)
        )
        grid_w = sampling_ratio if sampling_ratio > 0 else int(
            math.ceil(roi_w / pw)
        )
        grid_h = max(grid_h, 1)
        grid_w = max(grid_w, 1)
        img = feats[b]
        for i in range(ph):
            for j in range(pw):
                acc = feats.new_zeros(C)
                for iy in range(grid_h):
                    y = y1 + i * bin_h + (iy + 0.5) * bin_h / grid_h
                    for ix in range(grid_w):
                        x = x1 + j * bin_w + (ix + 0.5) * bin_w / grid_w
                        acc = acc + _bilinear(img, y, x)
                out[r, :, i, j] = acc / (grid_h * grid_w)
    return out


class CARAFEPackTorch(nn.Module):
    """mmcv CARAFEPack with the reassembly op done via unfold.

    Module/parameter names match mmcv exactly (channel_compressor,
    content_encoder) so state dicts convert 1:1.
    """

    def __init__(
        self,
        channels: int,
        scale_factor: int = 2,
        up_kernel: int = 5,
        up_group: int = 1,
        encoder_kernel: int = 3,
        encoder_dilation: int = 1,
        compressed_channels: int = 64,
    ):
        super().__init__()
        assert up_group == 1, "reference config uses up_group=1"
        self.channels = channels
        self.scale_factor = scale_factor
        self.up_kernel = up_kernel
        self.up_group = up_group
        self.encoder_kernel = encoder_kernel
        self.encoder_dilation = encoder_dilation
        self.compressed_channels = compressed_channels
        self.channel_compressor = nn.Conv2d(
            channels, compressed_channels, 1
        )
        self.content_encoder = nn.Conv2d(
            compressed_channels,
            up_kernel * up_kernel * up_group * scale_factor * scale_factor,
            encoder_kernel,
            padding=int((encoder_kernel - 1) * encoder_dilation / 2),
            dilation=encoder_dilation,
        )

    def kernel_normalizer(self, mask: torch.Tensor) -> torch.Tensor:
        # mmcv: pixel_shuffle then softmax over the k^2 window per group
        mask = F.pixel_shuffle(mask, self.scale_factor)
        n, mask_c, h, w = mask.size()
        mask_channel = int(mask_c / float(self.up_kernel ** 2))
        mask = mask.view(n, mask_channel, -1, h, w)
        mask = F.softmax(mask, dim=2)
        return mask.view(n, mask_c, h, w).contiguous()

    def feature_reassemble(
        self, x: torch.Tensor, mask: torch.Tensor
    ) -> torch.Tensor:
        # the mmcv CUDA carafe op: out[n,c,i,j] = sum_k mask[n,k,i,j] *
        # x[n, c, i//s + ky - k//2, j//s + kx - k//2]
        n, c, h, w = x.shape
        s, k = self.scale_factor, self.up_kernel
        patches = F.unfold(x, k, padding=k // 2)       # (n, c*k2, h*w)
        patches = patches.view(n, c, k * k, h, w)
        # nearest-upsample the patch grid to output resolution
        patches = patches.reshape(n, c * k * k, h, w)
        patches = F.interpolate(patches, scale_factor=s, mode="nearest")
        patches = patches.view(n, c, k * k, h * s, w * s)
        mask = mask.view(n, 1, k * k, h * s, w * s)
        return (patches * mask).sum(dim=2)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        compressed = self.channel_compressor(x)
        mask = self.content_encoder(compressed)
        mask = self.kernel_normalizer(mask)
        return self.feature_reassemble(x, mask)
