"""Train state, optimizer, schedule, and the jitted/pjitted train step.

Replaces the reference's mmcv EpochBasedRunner + hooks (tools/train.py,
runner/hooks/*): AdamW(2e-4, wd 0.01) + cosine annealing with 500-iter
linear warmup + global-norm grad clip 35 (configs/kitti_multiclass.py:
286-296), backbone stage freezing (frozen_stages=1), the LossUpdaterHook
schedule (gated inside train_forward), and the RobustKLLoss EMA buffer as
explicit train state.

Data parallelism: one jitted step with the batch sharded over a 1-D
'data' mesh axis via NamedSharding; XLA inserts the gradient all-reduce
over ICI. No DDP wrapper classes (reference: train.py:66-74, NCCL).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from .config import MonoRUnConfig
from .models.detector import MonoRUn, _train_forward

Array = jnp.ndarray


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    loss_ema: Array          # RobustKLLoss mean_inv_std buffer
    step: Array


def _is_frozen(path: Tuple[str, ...]) -> bool:
    """frozen_stages=1: stem + layer1 of the backbone don't train."""
    p = "/".join(str(k) for k in path)
    return (
        p.startswith("backbone/conv1")
        or p.startswith("backbone/bn1")
        or p.startswith("backbone/layer1_")
    )


def make_lr_schedule(cfg: MonoRUnConfig, total_steps: int):
    tr = cfg.train
    warmup = optax.linear_schedule(
        init_value=tr.lr * tr.warmup_ratio,
        end_value=tr.lr,
        transition_steps=tr.warmup_iters,
    )
    cosine = optax.cosine_decay_schedule(
        init_value=tr.lr,
        decay_steps=max(total_steps - tr.warmup_iters, 1),
    )
    return optax.join_schedules([warmup, cosine], [tr.warmup_iters])


def zap_nonfinite() -> optax.GradientTransformation:
    """Zero out non-finite gradient LEAVES before the global-norm clip.

    One NaN/inf gradient leaf makes the global norm non-finite and the
    clip then rescales EVERY parameter to NaN — a single degenerate
    geometry (near-singular PnP covariance, overflowing pose error on a
    masked row) poisons the whole run. The reference is shielded by
    accident (its PnP/covariance path runs outside autograd on CPU);
    here the equivalent failure containment is explicit. Zapped leaves
    show up in the ``nonfinite_grad_leaves`` train metric.
    """

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def fix(g):
            ok = jnp.all(jnp.isfinite(g))
            return jnp.where(ok, g, jnp.zeros_like(g))

        return jax.tree.map(fix, updates), state

    return optax.GradientTransformation(init, update)


def count_nonfinite_leaves(grads) -> Array:
    return sum(
        (~jnp.all(jnp.isfinite(g))).astype(jnp.int32)
        for g in jax.tree.leaves(grads)
    )


def clip_by_group_norms(
    default_norm: float, paramwise,
) -> optax.GradientTransformation:
    """Per-param-group gradient clipping.

    Reference: OptimizerHookMod.clip_grads (runner/hooks/optimizer.py:
    72-92) — parameters whose dotted name contains a ``paramwise`` key
    form their own clip group with that max_norm (first matching key
    wins); everything else clips under ``default_norm``. Each group is
    clipped by ITS OWN global norm, torch ``clip_grad_norm_`` semantics:
    scale = min(1, max_norm / (norm + 1e-6)).
    """
    paramwise = dict(paramwise)
    keys = tuple(paramwise.keys())

    def group_of(path) -> str:
        name = ".".join(str(getattr(p, "key", p)) for p in path)
        for k in keys:
            if k in name:
                return k
        return ""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        flat, treedef = jax.tree_util.tree_flatten_with_path(updates)
        groups = [group_of(p) for p, _ in flat]
        sumsq: Dict[str, list] = {}
        for g, (_, leaf) in zip(groups, flat):
            sumsq.setdefault(g, []).append(jnp.sum(jnp.square(leaf)))
        scale = {
            g: jnp.minimum(
                1.0,
                (paramwise.get(g) or default_norm)
                / (jnp.sqrt(sum(v)) + 1e-6),
            )
            for g, v in sumsq.items()
        }
        new_leaves = [
            leaf * scale[g] for g, (_, leaf) in zip(groups, flat)
        ]
        return jax.tree_util.tree_unflatten(treedef, new_leaves), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: MonoRUnConfig, total_steps: int):
    tr = cfg.train
    sched = make_lr_schedule(cfg, total_steps)
    clip = (
        clip_by_group_norms(tr.grad_clip_norm, tr.grad_clip_paramwise)
        if tr.grad_clip_paramwise
        else optax.clip_by_global_norm(tr.grad_clip_norm)
    )
    base = optax.chain(
        zap_nonfinite(),
        clip,
        optax.adamw(sched, weight_decay=tr.weight_decay),
    )
    label_fn = lambda params: jax.tree_util.tree_map_with_path(
        lambda path, _: "frozen"
        if _is_frozen(tuple(k.key for k in path))
        else "train",
        params,
    )
    return optax.multi_transform(
        {"train": base, "frozen": optax.set_to_zero()}, label_fn
    )


def create_train_state(
    cfg: MonoRUnConfig, rng: Array, total_steps: int,
    image_shape: Tuple[int, int],
) -> Tuple[MonoRUn, TrainState, Any]:
    model = MonoRUn(cfg)
    h, w = image_shape
    variables = jax.jit(model.init)(
        {"params": rng},
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.eye(3)[None],
        jnp.asarray([[float(h), float(w)]]),
        jax.random.PRNGKey(0),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, total_steps)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        loss_ema=jnp.asarray(1.0),
        step=jnp.asarray(0, jnp.int32),
    )
    return model, state, tx


def grad_stats(grads) -> Dict[str, Array]:
    """Per-top-level-module gradient norms (OptimizerHookMod's statistics
    dumps, runner/hooks/optimizer.py:29-57, as step metrics instead of
    text files)."""
    import optax as _optax

    out = {}
    for k, v in grads.items():
        out[f"gnorm/{k}"] = _optax.global_norm(v)
    out["gnorm/total"] = _optax.global_norm(grads)
    return out


def param_grad_stats(grads, params) -> Dict[str, Array]:
    """Per-PARAMETER gradient/weight statistics (rms, mean) as scalar
    metrics — the reference's save_stats text dumps
    (runner/hooks/optimizer.py:29-57: clipped_rms / sqrt(var) / mean per
    named parameter) computed on device; the train loop appends them to
    ``grad_stats.jsonl`` every ``train.save_stats_interval`` steps."""
    out: Dict[str, Array] = {}

    def add(tree, prefix):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = ".".join(str(getattr(k, "key", k)) for k in path)
            leaf = leaf.astype(jnp.float32)
            out[f"{prefix}/{name}/rms"] = jnp.sqrt(jnp.mean(leaf * leaf))
            out[f"{prefix}/{name}/mean"] = jnp.mean(leaf)

    add(grads, "grad")
    add(params, "weight")
    return out


def train_step(
    model: MonoRUn,
    tx,
    state: TrainState,
    batch: Dict[str, Array],
    rng: Array,
    with_grad_stats: bool = False,
    with_param_stats: bool = False,
) -> Tuple[TrainState, Dict[str, Array]]:
    """One optimisation step; jit (or pjit via sharded args) outside."""

    def loss_fn(params):
        (total, (metrics, new_ema)), updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch, rng, state.step, state.loss_ema,
            method=_train_forward,
            mutable=["batch_stats"],
        )
        return total, (metrics, new_ema, updates.get("batch_stats", {}))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (total, (metrics, new_ema, new_stats)), grads = grad_fn(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        params=new_params,
        batch_stats=new_stats if new_stats else state.batch_stats,
        opt_state=new_opt,
        loss_ema=new_ema,
        step=state.step + 1,
    )
    metrics = dict(metrics)
    metrics["total_loss"] = total
    metrics["nonfinite_grad_leaves"] = count_nonfinite_leaves(grads)
    if with_grad_stats:
        metrics.update(grad_stats(grads))
    if with_param_stats:
        metrics["param_stats"] = param_grad_stats(grads, state.params)
    return new_state, metrics
