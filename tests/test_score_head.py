"""Score-head statistics must be invariant to fixed-shape padding.

The reference only ever sees real RoIs (mlp_score_head.py:142-185,
iou3d_balanced_sampler.py:20-56); our fixed-shape batches append padded
rows that must not move the smooth-BN EMA or the pos/neg balance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.config import get_config
from monorun_tpu.models.score_head import (
    BatchNormSmooth,
    iou3d_balanced_sample_weights,
)


def _run_bn(x, valid):
    bn = BatchNormSmooth(features=x.shape[1], momentum=0.01)
    variables = bn.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = bn.apply(
        variables, x, train=True, valid=valid,
        mutable=["batch_stats"],
    )
    return out, mutated["batch_stats"]


def test_bn_ema_invariant_to_padding():
    rng = np.random.default_rng(0)
    x_real = jnp.asarray(rng.normal(size=(6, 17)).astype(np.float32))
    out_r, stats_r = _run_bn(x_real, jnp.ones((6,), bool))

    # append 10 garbage padded rows
    pad = jnp.asarray(rng.normal(size=(10, 17)).astype(np.float32) * 100)
    x_padded = jnp.concatenate([x_real, pad], axis=0)
    valid = jnp.concatenate(
        [jnp.ones((6,), bool), jnp.zeros((10,), bool)]
    )
    out_p, stats_p = _run_bn(x_padded, valid)

    np.testing.assert_array_equal(
        np.asarray(stats_r["mean"]), np.asarray(stats_p["mean"])
    )
    np.testing.assert_array_equal(
        np.asarray(stats_r["var"]), np.asarray(stats_p["var"])
    )
    # valid rows' outputs unchanged by the padding
    np.testing.assert_array_equal(
        np.asarray(out_r), np.asarray(out_p[:6])
    )


def test_bn_masked_moments_match_unmasked_on_real_rows():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 17)).astype(np.float32))
    _, stats = _run_bn(x, jnp.ones((8,), bool))
    m_ref = 0.01 * np.mean(np.asarray(x), axis=0)
    v_ref = 0.99 + 0.01 * np.var(np.asarray(x), axis=0, ddof=1)
    np.testing.assert_allclose(np.asarray(stats["mean"]), m_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]), v_ref, rtol=1e-5)


def test_bn_single_valid_row_does_not_update():
    """Reference skips the EMA update when batch size <= 1."""
    x = jnp.full((4, 17), 5.0)
    valid = jnp.asarray([True, False, False, False])
    _, stats = _run_bn(x, valid)
    np.testing.assert_array_equal(np.asarray(stats["mean"]), np.zeros(17))
    np.testing.assert_array_equal(np.asarray(stats["var"]), np.ones(17))


def test_sampler_counts_invariant_to_padding():
    cfg = get_config("kitti_multiclass").score_head
    rng = jax.random.PRNGKey(3)
    # heavily positive-skewed so the sampler is in the rebalancing regime
    ious_real = jnp.asarray([0.9, 0.85, 0.8, 0.75, 0.7, 0.1], jnp.float32)
    w_real = iou3d_balanced_sample_weights(
        cfg, ious_real, rng, valid=jnp.ones((6,), bool)
    )

    # padded slots report iou 0 and must not count as negatives
    ious_pad = jnp.concatenate([ious_real, jnp.zeros((20,), jnp.float32)])
    valid = jnp.concatenate([jnp.ones((6,), bool), jnp.zeros((20,), bool)])
    w_pad = iou3d_balanced_sample_weights(cfg, ious_pad, rng, valid=valid)

    np.testing.assert_array_equal(np.asarray(w_real), np.asarray(w_pad[:6]))
    # padded slots get zero weight
    assert float(jnp.sum(w_pad[6:])) == 0.0
