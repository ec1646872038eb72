import jax.numpy as jnp
import numpy as np

from monorun_tpu.losses import (

    kl_loss_mv,
    robust_kl_loss,
    sigmoid_bce_loss,
    smooth_l1_loss,
    softmax_ce_loss,
)

import pytest

pytestmark = pytest.mark.smoke  # seconds-fast numeric core


def test_smooth_l1_matches_definition():
    pred = jnp.asarray([0.5, 2.0, -3.0])
    tgt = jnp.zeros(3)
    loss = smooth_l1_loss(pred, tgt, beta=1.0, reduction="none")
    np.testing.assert_allclose(
        np.asarray(loss), [0.125, 1.5, 2.5], rtol=1e-6
    )


def test_smooth_l1_int_targets():
    pred = jnp.asarray([-0.5, 0.5])
    # target 0 -> abs(pred); target -1 -> pred (then abs for the huber)
    l0 = smooth_l1_loss(pred, 0, reduction="none")
    lm1 = smooth_l1_loss(pred, -1, reduction="none")
    np.testing.assert_allclose(np.asarray(l0), np.asarray(lm1))


def test_robust_kl_quadratic_and_linear_regions():
    mean_inv_std = jnp.asarray(1.0)
    # small weighted diff -> quadratic; logstd=0 so istd=1
    loss_small, _ = robust_kl_loss(
        jnp.asarray([0.5]), 0, jnp.zeros(1), mean_inv_std,
        training=False, reduction="none",
    )
    np.testing.assert_allclose(np.asarray(loss_small), [0.125], rtol=1e-5)
    # large -> linear: delta*(d - delta/2)
    delta = 1.414
    loss_big, _ = robust_kl_loss(
        jnp.asarray([5.0]), 0, jnp.zeros(1), mean_inv_std,
        training=False, reduction="none",
    )
    np.testing.assert_allclose(
        np.asarray(loss_big), [delta * (5.0 - delta / 2)], rtol=1e-5
    )


def test_robust_kl_ema_update():
    mean_inv_std = jnp.asarray(1.0)
    logstd = jnp.full((4,), -1.0)  # istd = e
    _, new_ema = robust_kl_loss(
        jnp.ones(4), 0, logstd, mean_inv_std, momentum=0.1, training=True,
    )
    np.testing.assert_allclose(
        float(new_ema), 0.9 * 1.0 + 0.1 * np.e, rtol=1e-5
    )
    _, frozen = robust_kl_loss(
        jnp.ones(4), 0, logstd, mean_inv_std, training=False,
    )
    assert float(frozen) == 1.0


def test_kl_loss_mv_identity_cov():
    diff = jnp.asarray([[1.0, 0.0, 0.0, 2.0]])
    inv_cov = jnp.eye(4)[None]
    loss = kl_loss_mv(diff, 0, inv_cov, reduction="none")
    np.testing.assert_allclose(np.asarray(loss), [[2.5]], rtol=1e-6)


def test_kl_loss_mv_guards_non_psd():
    diff = jnp.ones((2, 4))
    # det < 0 -> logdet is nan -> loss guarded to 0
    bad = jnp.diag(jnp.asarray([-1.0, 1.0, 1.0, 1.0]))[None]
    good = jnp.eye(4)[None]
    inv_cov = jnp.concatenate([bad, good], 0)
    loss = np.asarray(kl_loss_mv(diff, 0, inv_cov, reduction="none"))
    assert loss[0, 0] == 0.0
    np.testing.assert_allclose(loss[1, 0], 2.0, rtol=1e-6)


def test_bce_and_ce_against_manual():
    logits = jnp.asarray([0.3, -1.2])
    targets = jnp.asarray([1.0, 0.0])
    loss = np.asarray(sigmoid_bce_loss(logits, targets, reduction="none"))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    manual = -(np.asarray(targets) * np.log(p) + (1 - np.asarray(targets)) * np.log(1 - p))
    np.testing.assert_allclose(loss, manual, rtol=1e-5, atol=1e-4)

    cls_logits = jnp.asarray([[2.0, 0.5, -1.0]])
    labels = jnp.asarray([1])
    ce = float(softmax_ce_loss(cls_logits, labels))
    probs = np.exp([2.0, 0.5, -1.0]) / np.exp([2.0, 0.5, -1.0]).sum()
    np.testing.assert_allclose(ce, -np.log(probs[1]), rtol=1e-5)


def test_weighted_reduce_avg_factor():
    loss = smooth_l1_loss(
        jnp.ones(4) * 2.0, jnp.zeros(4), weight=jnp.asarray([1.0, 1, 0, 0]),
        avg_factor=2.0,
    )
    np.testing.assert_allclose(float(loss), 1.5, rtol=1e-6)
