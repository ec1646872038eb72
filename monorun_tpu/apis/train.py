"""Training loop: epochs, logging, checkpointing, periodic eval.

Replaces mmcv's EpochBasedRunner + hook stack (reference tools/train.py ->
mmdet train_detector): cosine LR with warmup and loss scheduling live
inside the optimizer/train_forward; this loop adds data-parallel batch
sharding, text/TensorBoard-style metric logging, checkpoint-every-K-epochs
and EvalHook-equivalent periodic validation.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    MonoRUnConfig,
    apply_loss_schedule,
    schedule_boundaries,
)
from ..data.kitti import KITTI3DDataset
from ..data.loader import PrefetchLoader
from ..parallel import make_mesh, replicate, shard_batch
from ..train import TrainState, create_train_state, train_step
from ..utils.checkpoint import latest_checkpoint, load_checkpoint, \
    save_checkpoint


class MetricLogger:
    """Text + JSONL + TensorBoard metric logging.

    Covers the reference log_config hook pair (TextLoggerHook +
    TensorboardLoggerHook, configs/kitti_multiclass.py:299-304). The TB
    writer is lazy and optional: event files land in workdir/tb/ when the
    tensorboard package is importable, otherwise logging degrades to
    text+JSONL with a one-time notice.
    """

    def __init__(self, workdir: str, interval: int = 10,
                 tensorboard: bool = True):
        self.interval = interval
        self.path = os.path.join(workdir, "train_log.jsonl")
        os.makedirs(workdir, exist_ok=True)
        self._t0 = time.time()
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except Exception as e:  # pragma: no cover - env-dependent
                print(f"[logger] tensorboard disabled ({e})", flush=True)

    def log(self, step: int, epoch: int, metrics: Dict[str, jnp.ndarray]):
        if step % self.interval:
            return
        rec = {k: round(float(v), 5) for k, v in metrics.items()}
        rec.update(step=step, epoch=epoch,
                   wall=round(time.time() - self._t0, 1))
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "epoch"):
                    self._tb.add_scalar(f"train/{k}", v, step)
        msg = " ".join(
            f"{k}={rec[k]:.4f}" for k in sorted(rec) if k.startswith("loss")
        )
        print(f"[e{epoch} it{step}] total={rec.get('total_loss', 0):.4f} "
              f"{msg} iou={rec.get('mean_iou', 0):.3f}", flush=True)

    def log_eval(self, step: int, ap: Dict[str, float]):
        """Scalar AP metrics from periodic validation (EvalHook logs)."""
        if self._tb is not None and ap:
            for k, v in ap.items():
                self._tb.add_scalar(f"val/{k}", float(v), step)

    def close(self):
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()


def train_detector(
    cfg: MonoRUnConfig,
    workdir: str,
    resume_from: Optional[str] = None,
    load_from: Optional[str] = None,
    max_steps: Optional[int] = None,
    val_ds: Optional[KITTI3DDataset] = None,
):
    """Full training run. Returns the final TrainState."""
    tr = cfg.train
    ds = KITTI3DDataset(
        cfg.data.train_root, cfg.data.train_list,
        classes=cfg.data.classes,
        coord_3d_prefix=cfg.data.coord_3d_prefix,
    )
    mesh = make_mesh()
    n_dev = mesh.devices.size
    global_batch = tr.samples_per_device * n_dev
    loader = PrefetchLoader(
        ds, cfg.data, global_batch, train=True, seed=tr.seed
    )
    steps_per_epoch = len(loader)
    total_steps = steps_per_epoch * tr.total_epochs
    if max_steps is not None:
        total_steps = min(total_steps, max_steps)

    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(tr.seed), total_steps,
        (cfg.data.pad_height, cfg.data.pad_width),
    )
    if load_from:
        from .inference import load_weights

        variables = load_weights(
            cfg, {"params": state.params, "batch_stats": state.batch_stats},
            load_from,
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
    if resume_from:
        state = load_checkpoint(resume_from, state)
    elif latest_checkpoint(workdir):
        state = load_checkpoint(latest_checkpoint(workdir), state)

    state = replicate(state, mesh)

    def make_step_fn(step_now: int):
        """Jitted train step specialised to the schedule-applied config
        (the LossUpdaterHook equivalent: config swaps by dotted path at
        schedule boundaries; runner/hooks/loss_updater.py:17-57)."""
        from ..models.detector import MonoRUn

        cfg_s = apply_loss_schedule(cfg, step_now)
        model_s = MonoRUn(cfg_s) if cfg_s != cfg else model
        return jax.jit(
            lambda s, b, r: train_step(
                model_s, tx, s, b, r, with_grad_stats=tr.log_grad_stats,
                with_param_stats=tr.save_stats_interval > 0,
            )
        )

    step = int(jax.device_get(state.step))
    boundaries = [b for b in schedule_boundaries(cfg) if b > step]
    step_fn = make_step_fn(step)
    logger = MetricLogger(workdir, tr.log_interval,
                          tensorboard=tr.tensorboard)
    rng = jax.random.PRNGKey(tr.seed + 1)

    epoch = step // max(steps_per_epoch, 1)
    while step < total_steps:
        for batch in loader:
            if boundaries and step >= boundaries[0]:
                while boundaries and step >= boundaries[0]:
                    boundaries.pop(0)
                step_fn = make_step_fn(step)
            batch.pop("_indices")
            sharded = shard_batch(
                jax.tree.map(jnp.asarray, batch), mesh
            )
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, sharded, sub)
            step += 1
            pstats = metrics.pop("param_stats", None)
            if (
                pstats is not None
                and tr.save_stats_interval
                and step % tr.save_stats_interval == 0
            ):
                # reference save_stats dumps (runner/hooks/optimizer.py:
                # 29-57) as one JSONL record per dumped step
                import json

                with open(
                    os.path.join(workdir, "grad_stats.jsonl"), "a"
                ) as f:
                    f.write(json.dumps({
                        "step": step,
                        **{k: float(jax.device_get(v))
                           for k, v in pstats.items()},
                    }) + "\n")
            logger.log(step, epoch, metrics)
            if max_steps is not None and step >= max_steps:
                break
        epoch += 1
        if tr.checkpoint_interval and epoch % tr.checkpoint_interval == 0:
            save_checkpoint(
                workdir, jax.device_get(state), step
            )
        if (
            val_ds is not None
            and tr.eval_interval
            and epoch % tr.eval_interval == 0
        ):
            logger.log_eval(step, _run_val(cfg, state, val_ds))
        if max_steps is not None and step >= max_steps:
            break

    save_checkpoint(workdir, jax.device_get(state), step)
    logger.close()
    return state


def _run_val(cfg: MonoRUnConfig, state: TrainState, val_ds: KITTI3DDataset):
    from .inference import InferenceSession
    from .test import run_eval

    session = InferenceSession(
        cfg,
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    return run_eval(session, val_ds, batch_size=2, print_summary=True)
