"""Checkpointing: orbax save/load + one-way torch .pth converter.

Replaces mmcv's CheckpointHook/load_checkpoint (reference
configs/kitti_multiclass.py:297, tools/train.py:164-169). Checkpoint state
covers everything the reference stores beyond conv/fc weights: BN running
stats, the score head's smooth-BN stats, the RobustKL EMA scalar, and
cov_calib_logscale (SURVEY §5 checkpoint notes).

``convert_torch_checkpoint`` maps the reference's released .pth files
(mmdet naming) onto our pytree: torch OIHW conv kernels -> HWIO, FC
weights transposed, FC layers fed by flattened conv maps keep torch's
(C, H, W) flatten order (our heads flatten in that order on purpose).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---- orbax save/load -------------------------------------------------------

def save_checkpoint(path: str, state: Any, step: int) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    target = os.path.join(path, f"step_{step}")
    ckpt.save(target, jax.tree.map(np.asarray, state), force=True)
    ckpt.wait_until_finished()
    return target


def load_checkpoint(path: str, state_template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), state_template)


def latest_checkpoint(workdir: str) -> str | None:
    if not os.path.isdir(workdir):
        return None
    steps = []
    for name in os.listdir(workdir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(workdir, f"step_{max(steps)}")


# ---- torch .pth conversion -------------------------------------------------

def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))    # OIHW -> HWIO


def _fc(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))          # (out, in) -> (in, out)


def _torch_key_map(key: str) -> Tuple[Tuple[str, ...], str] | None:
    """Map a reference state-dict key to (our param path, kind).

    kind in {conv, fc, raw, bn_scale, bn_bias, bn_mean, bn_var}.
    Returns None for keys we deliberately drop (num_batches_tracked, ...).
    """
    k = key
    if k.endswith("num_batches_tracked"):
        return None

    # ---- backbone -----------------------------------------------------
    m = re.fullmatch(r"backbone\.conv1\.weight", k)
    if m:
        return ("backbone", "conv1", "kernel"), "conv"
    m = re.fullmatch(r"backbone\.bn1\.(\w+)", k)
    if m:
        return ("backbone", "bn1"), "bn_" + {
            "weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var",
        }[m.group(1)]
    m = re.fullmatch(
        r"backbone\.layer(\d)\.(\d+)\.(conv\d)\.weight", k
    )
    if m:
        return (
            "backbone", f"layer{m.group(1)}_{m.group(2)}", m.group(3),
            "kernel",
        ), "conv"
    m = re.fullmatch(r"backbone\.layer(\d)\.(\d+)\.(bn\d)\.(\w+)", k)
    if m:
        return (
            "backbone", f"layer{m.group(1)}_{m.group(2)}", m.group(3),
        ), "bn_" + {
            "weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var",
        }[m.group(4)]
    m = re.fullmatch(
        r"backbone\.layer(\d)\.(\d+)\.downsample\.0\.weight", k
    )
    if m:
        return (
            "backbone", f"layer{m.group(1)}_{m.group(2)}",
            "downsample_conv", "kernel",
        ), "conv"
    m = re.fullmatch(
        r"backbone\.layer(\d)\.(\d+)\.downsample\.1\.(\w+)", k
    )
    if m:
        return (
            "backbone", f"layer{m.group(1)}_{m.group(2)}", "downsample_bn",
        ), "bn_" + {
            "weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var",
        }[m.group(3)]

    # ---- neck ----------------------------------------------------------
    m = re.fullmatch(r"neck\.lateral_convs\.(\d)\.conv\.(weight|bias)", k)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("neck", f"lateral{m.group(1)}", leaf), kind
    m = re.fullmatch(r"neck\.fpn_convs\.(\d)\.conv\.(weight|bias)", k)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("neck", f"fpn{m.group(1)}", leaf), kind
    m = re.fullmatch(r"neck\.lower_fpn_convs\.(\d)\.conv\.(weight|bias)", k)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("neck", f"lower{m.group(1)}", leaf), kind

    # ---- rpn -----------------------------------------------------------
    m = re.fullmatch(r"rpn_head\.(rpn_conv|rpn_cls|rpn_reg)\.(weight|bias)", k)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("rpn_head", m.group(1), leaf), kind

    # ---- bbox head -------------------------------------------------------
    m = re.fullmatch(
        r"roi_head\.bbox_head\.shared_fcs\.(\d)\.(weight|bias)", k
    )
    if m:
        kind = "fc" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("bbox_head", f"shared_fc{m.group(1)}", leaf), kind
    m = re.fullmatch(r"roi_head\.bbox_head\.(fc_cls|fc_reg)\.(weight|bias)", k)
    if m:
        kind = "fc" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("bbox_head", m.group(1), leaf), kind

    # ---- global head -----------------------------------------------------
    m = re.fullmatch(r"roi_head\.global_head\.fcs\.0\.(weight|bias)", k)
    if m:
        if m.group(1) == "weight":
            return ("global_head", "fc0_kernel"), "fc"
        return ("global_head", "fc0_bias"), "raw"
    m = re.fullmatch(r"roi_head\.global_head\.fcs\.1\.(weight|bias)", k)
    if m:
        kind = "fc" if m.group(1) == "weight" else "raw"
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("global_head", "fc1", leaf), kind
    m = re.fullmatch(r"roi_head\.global_head\.fc_reg\.(weight|bias)", k)
    if m:
        kind = "fc" if m.group(1) == "weight" else "raw"
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("global_head", "fc_reg", leaf), kind

    # ---- noc head ----------------------------------------------------------
    m = re.fullmatch(r"roi_head\.noc_head\.convs\.(\d)\.conv\.(weight|bias)", k)
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("noc_head", f"conv{m.group(1)}", leaf), kind
    m = re.fullmatch(
        r"roi_head\.noc_head\.convs_upsampled\.(\d)\.conv\.(weight|bias)", k
    )
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("noc_head", f"conv_up{m.group(1)}", leaf), kind
    m = re.fullmatch(r"roi_head\.noc_head\.latent_decoder\.(weight|bias)", k)
    if m:
        kind = "fc" if m.group(1) == "weight" else "raw"
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("noc_head", "latent_decoder", leaf), kind
    m = re.fullmatch(
        r"roi_head\.noc_head\.upsample\.(channel_compressor|content_encoder)"
        r"\.(weight|bias)", k,
    )
    if m:
        kind = "conv" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("noc_head", "upsample", m.group(1), leaf), kind
    m = re.fullmatch(r"roi_head\.noc_head\.conv_final\.(weight|bias)", k)
    if m:
        kind = "conv" if m.group(1) == "weight" else "raw"
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("noc_head", "conv_final", leaf), kind

    # ---- score head ----------------------------------------------------------
    m = re.fullmatch(r"roi_head\.score_head\.pose_norm\.(\w+)", k)
    if m:
        return ("score_head", "pose_norm"), "bn_" + {
            "weight": "scale", "bias": "bias",
            "running_mean": "mean", "running_var": "var",
        }[m.group(1)]
    m = re.fullmatch(r"roi_head\.score_head\.pose_fcs\.(\d)\.(weight|bias)", k)
    if m:
        kind = "fc" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("score_head", f"pose_fc{m.group(1)}", leaf), kind
    m = re.fullmatch(r"roi_head\.score_head\.fused_fcs\.(\d)\.(weight|bias)", k)
    if m:
        kind = "fc" if m.group(2) == "weight" else "raw"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        return ("score_head", f"fused_fc{m.group(1)}", leaf), kind
    m = re.fullmatch(r"roi_head\.score_head\.fc_out\.(weight|bias)", k)
    if m:
        kind = "fc" if m.group(1) == "weight" else "raw"
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return ("score_head", "fc_out", leaf), kind

    # ---- pose head / loss buffers ----------------------------------------------
    if k == "roi_head.pose_head.cov_calib_logscale":
        return ("cov_calib_logscale",), "raw"
    if k == "roi_head.projection_head.loss_proj.mean_inv_std":
        return ("__loss_ema__",), "raw"

    return ("__unmapped__", k), "raw"


def convert_torch_checkpoint(
    pth_path: str, params: Any, batch_stats: Any
) -> Tuple[Any, Any, float, Dict[str, str]]:
    """Load a reference .pth and place its weights into our pytrees.

    Returns (params, batch_stats, loss_ema, report) where report maps
    torch keys to 'ok' / 'unmapped' / 'shape-mismatch:...'.
    """
    import torch

    raw = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    loss_ema = 1.0
    report: Dict[str, str] = {}

    def set_path(tree, path, value, torch_key):
        node = tree
        for p in path[:-1]:
            if p not in node:
                report[torch_key] = f"missing-path:{'/'.join(path)}"
                return False
            node = node[p]
        leaf = path[-1]
        if leaf not in node:
            report[torch_key] = f"missing-leaf:{'/'.join(path)}"
            return False
        if node[leaf].shape != value.shape:
            report[torch_key] = (
                f"shape-mismatch:{'/'.join(path)} "
                f"{node[leaf].shape} vs {value.shape}"
            )
            return False
        node[leaf] = value.astype(node[leaf].dtype)
        report[torch_key] = "ok"
        return True

    for key, tensor in sd.items():
        mapped = _torch_key_map(key)
        if mapped is None:
            continue
        path, kind = mapped
        if path[0] == "__unmapped__":
            report[key] = "unmapped"
            continue
        val = tensor.detach().cpu().numpy()
        if path[0] == "__loss_ema__":
            loss_ema = float(val)
            report[key] = "ok"
            continue
        if kind == "conv":
            val = _conv(val)
        elif kind == "fc":
            val = _fc(val)
        if kind.startswith("bn_"):
            leaf = kind[3:]
            if leaf in ("scale", "bias"):
                set_path(params, path + (leaf,), val, key)
            else:
                set_path(batch_stats, path + (leaf,), val, key)
        else:
            set_path(params, path, val, key)

    return params, batch_stats, loss_ema, report
