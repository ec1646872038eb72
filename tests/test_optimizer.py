"""Optimizer plumbing: per-param-group clipping and stat dumps.

Fast tier (no model graph): covers monorun_tpu/train.py's
clip_by_group_norms and param_grad_stats against hand-computed values.
"""

import jax.numpy as jnp
import numpy as np

import pytest

pytestmark = pytest.mark.smoke  # seconds-fast numeric core

def test_clip_by_group_norms_paramwise():
    """Per-param-group clipping (reference OptimizerHookMod paramwise_cfg,
    runner/hooks/optimizer.py:72-92): each group is clipped by its own
    global norm; substring keys select groups; first match wins."""
    from monorun_tpu.train import clip_by_group_norms

    tx = clip_by_group_norms(1.0, {"score_head": 0.5})
    grads = {
        "backbone": {"w": jnp.full((4,), 3.0)},      # norm 6 -> scale 1/6
        "score_head": {"w": jnp.full((4,), 3.0)},    # norm 6 -> 0.5/6
    }
    out, _ = tx.update(grads, tx.init(grads))
    np.testing.assert_allclose(
        np.asarray(out["backbone"]["w"]), 3.0 / 6.0, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["score_head"]["w"]), 3.0 * 0.5 / 6.0, rtol=2e-5
    )
    # small grads stay unclipped (scale capped at 1)
    small = {
        "backbone": {"w": jnp.full((4,), 0.1)},
        "score_head": {"w": jnp.full((4,), 0.1)},
    }
    out, _ = tx.update(small, tx.init(small))
    np.testing.assert_allclose(np.asarray(out["backbone"]["w"]), 0.1,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out["score_head"]["w"]), 0.1,
                               rtol=2e-5)


def test_param_grad_stats_shapes():
    from monorun_tpu.train import param_grad_stats

    grads = {"m": {"kernel": jnp.ones((2, 3)), "bias": jnp.zeros((3,))}}
    params = {"m": {"kernel": 2 * jnp.ones((2, 3)),
                    "bias": jnp.zeros((3,))}}
    out = param_grad_stats(grads, params)
    assert float(out["grad/m.kernel/rms"]) == 1.0
    assert float(out["weight/m.kernel/mean"]) == 2.0
    assert set(k.split("/")[0] for k in out) == {"grad", "weight"}
