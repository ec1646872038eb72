"""Loss functions (pure, fixed-shape, mask-weighted).

Re-implements the reference losses:

* ``robust_kl_loss``  — models/losses/robust_kl_loss.py (Huber-ised attenuated
  NLL divided by an EMA of the mean inverse-std; the EMA buffer becomes
  explicit functional state threaded through the train step).
* ``kl_loss_mv``      — models/losses/kl_loss_mv.py (multivariate KL with
  nan/inf logdet guard).
* ``smooth_l1_loss``  — models/losses/smooth_l1_loss.py (accepts integer
  pseudo-targets 0 / -1 like the reference mod).
* standard detection losses (sigmoid BCE, softmax CE) used by RPN/R-CNN.

All losses take an optional element weight and an ``avg_factor``; with
fixed-shape padding the weight doubles as the validity mask, so empty-RoI
special cases in the reference become plain zero-weight reductions.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def weighted_reduce(
    loss: Array,
    weight: Optional[Array] = None,
    reduction: str = "mean",
    avg_factor: Optional[Array] = None,
    eps: float = 1e-12,
) -> Array:
    """mmdet-style weighted reduction over a fixed-shape loss tensor."""
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if avg_factor is None:
        if weight is None:
            return jnp.mean(loss)
        # Mean over weighted elements (broadcast weight to loss shape).
        w = jnp.broadcast_to(weight, loss.shape)
        return jnp.sum(loss) / jnp.clip(jnp.sum(w), eps, None)
    return jnp.sum(loss) / jnp.clip(avg_factor, eps, None)


def _diff(pred: Array, target: Union[Array, int], absolute: bool) -> Array:
    """Difference handling the reference's integer pseudo-targets."""
    if isinstance(target, int):
        if target == 0:
            return jnp.abs(pred) if absolute else pred
        if target == -1:
            return pred
        raise ValueError(f"unsupported int target {target}")
    d = pred - target
    return jnp.abs(d) if absolute else d


def smooth_l1_loss(
    pred: Array,
    target: Union[Array, int],
    beta: float = 1.0,
    weight: Optional[Array] = None,
    reduction: str = "mean",
    avg_factor: Optional[Array] = None,
) -> Array:
    diff = jnp.abs(_diff(pred, target, absolute=True))
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return weighted_reduce(loss, weight, reduction, avg_factor)


def robust_kl_loss(
    pred: Array,
    target: Union[Array, int],
    logstd: Array,
    mean_inv_std: Array,
    weight: Optional[Array] = None,
    delta: float = 1.414,
    momentum: float = 0.1,
    eps: float = 1e-4,
    training: bool = True,
    reduction: str = "mean",
    avg_factor: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Huber-ised attenuated NLL with EMA normalisation.

    Returns ``(loss, new_mean_inv_std)``; callers thread the EMA scalar
    through their mutable state (the reference keeps it as a module buffer,
    robust_kl_loss.py:43).
    """
    diff = _diff(pred, target, absolute=True)
    inverse_std = jnp.clip(jnp.exp(-logstd), None, 1.0 / eps)
    dw = diff * inverse_std
    loss = (
        jnp.where(dw < delta, 0.5 * jnp.square(dw), delta * (dw - 0.5 * delta))
        + logstd
    )
    if training:
        batch_mean = jnp.mean(jax.lax.stop_gradient(inverse_std))
        new_mean_inv_std = (1.0 - momentum) * mean_inv_std + momentum * batch_mean
    else:
        new_mean_inv_std = mean_inv_std
    loss = loss / jnp.clip(new_mean_inv_std, 1e-6, None)
    return weighted_reduce(loss, weight, reduction, avg_factor), new_mean_inv_std


def kl_loss_mv(
    pred: Array,                  # (n, d)
    target: Union[Array, int],    # (n, d) or 0
    inv_cov: Array,               # (n, d, d)
    weight: Optional[Array] = None,
    reduction: str = "mean",
    avg_factor: Optional[Array] = None,
) -> Array:
    """Multivariate KL: 0.5 * (diff^T S^-1 diff - logdet S^-1), guarded.

    The degeneracy guard must act on the slogdet INPUT, not its output:
    ``where(bad, 0, f(A))`` still differentiates f at the bad A, and
    d(logabsdet)/dA = A^-T is inf/NaN for singular or non-finite A — one
    such matrix turns the whole gradient tree NaN through the global-norm
    clip (reproduced at convergence-probe step 9: near-singular PnP
    covariances whose determinant rounds to 0 under some compilations).
    Validity is decided on stop_gradient values and bad matrices are
    replaced by the identity before slogdet, so the dead branch is
    differentiable everywhere.
    """
    diff = _diff(pred, target, absolute=False)
    d = inv_cov.shape[-1]
    ic0 = jax.lax.stop_gradient(inv_cov)
    sign0, logdet0 = jnp.linalg.slogdet(ic0)
    # logdet > -60 also rejects PD-but-nearly-singular matrices whose
    # inverse (the logabsdet gradient) would overflow f32
    ok = (
        jnp.all(jnp.isfinite(ic0.reshape(ic0.shape[0], -1)), axis=-1)
        & (sign0 > 0)
        & jnp.isfinite(logdet0)
        & (logdet0 > -60.0)
    )
    safe = jnp.where(ok[:, None, None], inv_cov, jnp.eye(d, dtype=inv_cov.dtype))
    _, logabsdet = jnp.linalg.slogdet(safe)
    dw = jnp.einsum("ni,nij,nj->n", diff, safe, diff)
    loss = jnp.where(ok, (dw - logabsdet) / 2.0, 0.0)
    return weighted_reduce(loss[:, None], weight, reduction, avg_factor)


def sigmoid_bce_loss(
    logits: Array,
    targets: Array,
    weight: Optional[Array] = None,
    reduction: str = "mean",
    avg_factor: Optional[Array] = None,
) -> Array:
    """Binary cross-entropy with logits (RPN cls / score head)."""
    loss = (
        jnp.clip(logits, 0, None)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return weighted_reduce(loss, weight, reduction, avg_factor)


def softmax_ce_loss(
    logits: Array,        # (n, num_classes)
    labels: Array,        # (n,) int
    weight: Optional[Array] = None,
    reduction: str = "mean",
    avg_factor: Optional[Array] = None,
) -> Array:
    """Softmax cross-entropy (R-CNN classification)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    ll = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    loss = logz - ll
    return weighted_reduce(loss, weight, reduction, avg_factor)
