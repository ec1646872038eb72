"""Verbatim-behaviour torch replicas of the reference 3D heads.

Plain-torch ports (no mmcv/mmdet) of:

- FCExtractor (bbox_3d_heads/global_extractors/fc_extractor.py:89-101)
- FCNNOCDecoder (bbox_3d_heads/dense_decoders/fcn_noc_decoder.py:190-267)
- MLPScoreHead + BatchNormSmooth1D (score_heads/mlp_score_head.py:94-185)

Parameter names reproduce the reference state-dict key layout exactly
(ModuleList indices, ConvModule ``.conv`` nesting, CARAFEPack submodule
names) so a state dict exported from these modules is byte-compatible
with the released checkpoints' key space — the converter regression test
depends on this.
"""

from __future__ import annotations

import torch
import torch.nn as nn

from .ops import CARAFEPackTorch


class ConvModuleTorch(nn.Module):
    """mmcv ConvModule with norm_cfg=None: Conv2d (bias) + ReLU."""

    def __init__(self, in_ch, out_ch, k, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding)

    def forward(self, x):
        return torch.relu(self.conv(x))


class FCExtractorTorch(nn.Module):
    """fc_extractor.py forward, eval mode (dropout inactive)."""

    def __init__(
        self,
        num_fcs=2,
        in_channels=256,
        fc_out_channels=1024,
        num_classes=3,
        roi_feat_size=7,
        latent_channels=16,
        latent_class_agnostic=False,
    ):
        super().__init__()
        self.fcs = nn.ModuleList()
        last = in_channels * roi_feat_size * roi_feat_size
        for i in range(num_fcs):
            self.fcs.append(
                nn.Linear(last if i == 0 else fc_out_channels,
                          fc_out_channels)
            )
        out_dim = 3 + latent_channels
        if not latent_class_agnostic:
            out_dim *= num_classes
        self.fc_reg = nn.Linear(fc_out_channels, out_dim)

    def forward(self, x):
        # x: (n, C, 7, 7). eval: dropout2d/dropout are identity
        x = x.flatten(1)
        for fc in self.fcs:
            x = torch.relu(fc(x))
        dim_latent_pred = self.fc_reg(x)
        return dim_latent_pred, x


class FCNNOCDecoderTorch(nn.Module):
    """fcn_noc_decoder.py forward + slice_pred, eval mode."""

    def __init__(
        self,
        num_convs=3,
        in_channels=256,
        conv_out_channels=256,
        num_classes=3,
        class_agnostic=False,
        noc_channels=3,
        uncert_channels=2,
        flip_correction=True,
        latent_channels=16,
        up_kernel=5,
        encoder_kernel=3,
        compressed_channels=64,
    ):
        super().__init__()
        self.num_classes = num_classes
        self.class_agnostic = class_agnostic
        self.noc_channels = noc_channels
        self.uncert_channels = uncert_channels
        self.flip_correction = flip_correction
        self.latent_decoder = nn.Linear(latent_channels, conv_out_channels)
        self.convs = nn.ModuleList()
        for i in range(num_convs):
            self.convs.append(
                ConvModuleTorch(
                    in_channels if i == 0 else conv_out_channels,
                    conv_out_channels, 3, padding=1,
                )
            )
        self.upsample = CARAFEPackTorch(
            conv_out_channels, scale_factor=2, up_kernel=up_kernel,
            encoder_kernel=encoder_kernel,
            compressed_channels=compressed_channels,
        )
        self.convs_upsampled = nn.ModuleList(
            [ConvModuleTorch(conv_out_channels, conv_out_channels, 3,
                             padding=1)]
        )
        per = (noc_channels + uncert_channels) * (
            1 if class_agnostic else num_classes
        )
        self.conv_final = nn.Conv2d(
            conv_out_channels, per * (2 if flip_correction else 1), 1
        )

    def forward(self, x, latent_pred, labels, flip):
        # eval: dropout2d identity
        for conv in self.convs:
            x = conv(x)
        deform = self.latent_decoder(latent_pred)[..., None, None]
        x = x + deform
        x = self.upsample(x)
        for conv in self.convs_upsampled:
            x = conv(x)
        all_pred = self.conv_final(x)
        if self.flip_correction:
            all_pred = all_pred.view(
                all_pred.size(0), 2, all_pred.size(1) // 2,
                all_pred.size(2), all_pred.size(3),
            )
            inds = torch.arange(all_pred.size(0), dtype=torch.long)
            all_pred = all_pred[inds, inds.new_tensor(flip)]
        return self.slice_pred(all_pred, labels)

    def slice_pred(self, all_pred, labels):
        ncls = 1 if self.class_agnostic else self.num_classes
        split = [self.noc_channels * ncls, self.uncert_channels * ncls]
        all_noc, all_logstd = all_pred.split(split, dim=1)
        if self.class_agnostic:
            return all_noc, all_logstd
        n, _, h, w = all_noc.size()
        inds = torch.arange(n, dtype=torch.long)
        noc = all_noc.view(n, ncls, self.noc_channels, h, w)[inds, labels]
        logstd = all_logstd.view(
            n, ncls, self.uncert_channels, h, w
        )[inds, labels]
        return noc, logstd


class BatchNormSmooth1DTorch(nn.Module):
    """mlp_score_head.py:142-185 in eval mode: running-stat normalise."""

    def __init__(self, num_features, eps=1e-5, momentum=0.01):
        super().__init__()
        self.eps = eps
        self.momentum = momentum
        self.weight = nn.Parameter(torch.ones(num_features))
        self.bias = nn.Parameter(torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))
        self.register_buffer(
            "num_batches_tracked", torch.tensor(0, dtype=torch.long)
        )

    def forward(self, x):
        return (
            x.sub(self.running_mean)
            .div((self.running_var + self.eps).sqrt())
            .mul(self.weight)
            .add(self.bias)
        )


class MLPScoreHeadTorch(nn.Module):
    """mlp_score_head.py:94-115 forward (additive fusion), eval mode."""

    def __init__(
        self,
        reg_fc_out_channels=1024,
        pose_fc_out_channels=1024,
        fc_out_channels=256,
        num_pose_fcs=1,
        num_fused_fcs=1,
    ):
        super().__init__()
        self.pose_norm = BatchNormSmooth1DTorch(17)
        self.pose_fcs = nn.ModuleList()
        last = 17
        for i in range(num_pose_fcs):
            self.pose_fcs.append(
                nn.Linear(last if i == 0 else pose_fc_out_channels,
                          pose_fc_out_channels)
            )
        self.fused_fcs = nn.ModuleList()
        for i in range(num_fused_fcs):
            self.fused_fcs.append(
                nn.Linear(
                    reg_fc_out_channels if i == 0 else fc_out_channels,
                    fc_out_channels,
                )
            )
        self.fc_out = nn.Linear(fc_out_channels, 1)

    def forward(self, reg_fc_out, yaw, t_vec, pose_cov, dimensions):
        ix, iy = torch.tril_indices(4, 4)
        cov_tril = pose_cov[:, ix, iy]
        x = torch.cat([yaw, t_vec, cov_tril, dimensions], dim=1)
        x = self.pose_norm(x)
        for fc in self.pose_fcs:
            x = torch.relu(fc(x))
        x = x + reg_fc_out
        for fc in self.fused_fcs:
            x = torch.relu(fc(x))
        return self.fc_out(x).squeeze(1)
