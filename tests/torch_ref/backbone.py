"""Torch replicas of the reference's backbone-to-bbox-head stack.

Plain-torch stand-ins for the mmdet modules the reference binds
(configs/kitti_multiclass.py:4-57): ResNet 'pytorch'-style bottlenecks
(stride on conv2), FPNplus with the extra bilinear stride-2 level
(fpn_plus.py:56-119), the shared RPN head (rpn_head.py), and
Shared2FCBBoxHead. State-dict key names match the released checkpoints
exactly, so tests can export a replica state dict, push it through
convert_torch_checkpoint, and compare composed activations stage by
stage (tests/test_golden_detector.py).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

STAGE_BLOCKS = {26: (1, 1, 1, 1), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class BottleneckTorch(nn.Module):
    def __init__(self, inplanes, planes, stride=1, has_downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if has_downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


class ResNetTorch(nn.Module):
    """Returns (C2, C3, C4, C5); always eval-mode BN (frozen stats)."""

    def __init__(self, depth=50):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        inplanes, planes = 64, 64
        for stage, n in enumerate(STAGE_BLOCKS[depth]):
            blocks = []
            for i in range(n):
                blocks.append(BottleneckTorch(
                    inplanes if i == 0 else planes * 4, planes,
                    stride=(1 if stage == 0 else 2) if i == 0 else 1,
                    has_downsample=(i == 0),
                ))
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
            inplanes, planes = planes * 4, planes * 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            outs.append(x)
        return outs


class _ConvModule(nn.Module):
    """mmcv ConvModule shell: the inner conv is attribute ``conv``."""

    def __init__(self, cin, cout, k, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=padding)

    def forward(self, x):
        return self.conv(x)


class FPNplusTorch(nn.Module):
    """fpn_plus.py:56-119: nearest top-down, bilinear stride-2 lower level,
    1x1-maxpool-stride-2 P6."""

    def __init__(self, in_channels=(256, 512, 1024, 2048), out_channels=256,
                 num_outs=5, num_lower_outs=1):
        super().__init__()
        self.num_outs = num_outs
        self.num_lower_outs = num_lower_outs
        self.lateral_convs = nn.ModuleList(
            [_ConvModule(c, out_channels, 1) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [_ConvModule(out_channels, out_channels, 3, padding=1)
             for _ in in_channels]
        )
        self.lower_fpn_convs = nn.ModuleList(
            [_ConvModule(out_channels, out_channels, 3, padding=1)
             for _ in range(num_lower_outs)]
        )

    def forward(self, inputs):
        laterals = [c(x) for c, x in zip(self.lateral_convs, inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], scale_factor=2, mode="nearest"
            )
        outs_lower = [
            c(F.interpolate(
                laterals[0],
                scale_factor=2 ** (self.num_lower_outs - i),
                mode="bilinear",
            ))
            for i, c in enumerate(self.lower_fpn_convs)
        ]
        outs = [c(l) for c, l in zip(self.fpn_convs, laterals)]
        while len(outs) < self.num_outs:
            outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs_lower + outs


class RPNHeadTorch(nn.Module):
    def __init__(self, in_channels=256, feat_channels=256, num_anchors=3):
        super().__init__()
        self.rpn_conv = nn.Conv2d(in_channels, feat_channels, 3, padding=1)
        self.rpn_cls = nn.Conv2d(feat_channels, num_anchors, 1)
        self.rpn_reg = nn.Conv2d(feat_channels, num_anchors * 4, 1)

    def forward(self, feats):
        cls_scores, bbox_preds = [], []
        for f in feats:
            x = F.relu(self.rpn_conv(f))
            cls_scores.append(self.rpn_cls(x))
            bbox_preds.append(self.rpn_reg(x))
        return cls_scores, bbox_preds


class Shared2FCBBoxHeadTorch(nn.Module):
    def __init__(self, in_channels=256, roi_feat_size=7,
                 fc_out_channels=1024, num_classes=3,
                 reg_class_agnostic=False):
        super().__init__()
        a = roi_feat_size * roi_feat_size
        self.shared_fcs = nn.ModuleList([
            nn.Linear(in_channels * a, fc_out_channels),
            nn.Linear(fc_out_channels, fc_out_channels),
        ])
        self.fc_cls = nn.Linear(fc_out_channels, num_classes + 1)
        n_reg = 4 if reg_class_agnostic else 4 * num_classes
        self.fc_reg = nn.Linear(fc_out_channels, n_reg)

    def forward(self, roi_feats_nchw):
        x = roi_feats_nchw.flatten(1)        # torch (C, H, W) flatten order
        for fc in self.shared_fcs:
            x = F.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


class _RoIHeadShell(nn.Module):
    def __init__(self, bbox_head):
        super().__init__()
        self.bbox_head = bbox_head


class DetectorTorso(nn.Module):
    """backbone + neck + rpn_head + roi_head.bbox_head under the reference
    state-dict prefixes."""

    def __init__(self, depth=50, num_classes=3, num_anchors=3,
                 out_channels=256, fc_out_channels=1024):
        super().__init__()
        self.backbone = ResNetTorch(depth)
        self.neck = FPNplusTorch(out_channels=out_channels)
        self.rpn_head = RPNHeadTorch(out_channels, out_channels, num_anchors)
        self.roi_head = _RoIHeadShell(Shared2FCBBoxHeadTorch(
            out_channels, 7, fc_out_channels, num_classes
        ))

    @torch.no_grad()
    def stages(self, img_nchw):
        self.eval()
        feats = self.backbone(img_nchw)
        fpn = self.neck(feats)
        cls_scores, bbox_preds = self.rpn_head(fpn[1:])
        return feats, fpn, cls_scores, bbox_preds
