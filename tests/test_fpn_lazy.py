"""Composed dense-vs-lazy FPN stride-2 level tests.

The lazy lower level (NeckConfig.lazy_lower, models/fpn.py) replaces the
reference's conv(up2(lateral)) (fpn_plus.py:79-91) with conv(lateral)
sampled at stride 4. That is an approximation — the 3x3 conv's tap pitch
doubles, so outputs differ by the kernel-first-moment term even on
globally linear fields. These tests (a) verify the DENSE path is
reference-exact against torch's interpolate+conv, (b) measure and bound
the composed FPN -> RoIAlign deviation of the lazy path, and (c) assert
the deviation is real (no "exact" claim can silently return).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monorun_tpu.models.fpn import FPNplus, _upsample_bilinear
from monorun_tpu.ops.roi_align import multilevel_roi_align


def _make_inputs(rng, noise, B=1, H=48, W=64):
    """Backbone-like pyramid: smooth structure + ``noise``-std white noise."""
    chans = (32, 64, 96, 128)
    inputs = []
    h, w = H, W
    for c in chans:
        yy, xx = np.meshgrid(
            np.linspace(0, 3, h, dtype=np.float32),
            np.linspace(0, 3, w, dtype=np.float32),
            indexing="ij",
        )
        smooth = np.sin(yy)[..., None] * np.cos(xx)[..., None]
        x = (
            np.broadcast_to(smooth, (B, h, w, c))
            + noise * rng.normal(size=(B, h, w, c))
        ).astype(np.float32)
        inputs.append(jnp.asarray(x))
        h, w = h // 2, w // 2
    return inputs


def _fpn_pair(rng, noise=0.5):
    """(dense_outs, lazy_outs, inputs): same weights, both builds."""
    inputs = _make_inputs(rng, noise)
    dense = FPNplus(out_channels=64, num_outs=5, num_lower_outs=1,
                    lazy_lower=False)
    params = dense.init(jax.random.PRNGKey(0), inputs)
    lazy = FPNplus(out_channels=64, num_outs=5, num_lower_outs=1,
                   lazy_lower=True)
    return dense.apply(params, inputs), lazy.apply(params, inputs), inputs


def _composed_rel_err(dense_outs, lazy_outs):
    """FPN -> RoIAlign composed error, normalised by the level's std.

    This is the path the detector actually runs for stride-2-assigned
    RoIs: dense build sampled at stride 2 vs lazy build sampled at
    stride 4 (detector._align_strides).
    """
    d0, l0 = dense_outs[0], lazy_outs[0]
    assert d0.shape[1] == 2 * l0.shape[1]  # stride 2 vs physical stride 4
    # small RoIs across the image -> level 0 (finest_scale 20, area < 40^2)
    r = np.asarray(np.meshgrid(
        np.linspace(8, 150, 5), np.linspace(8, 100, 4), indexing="ij"
    )).reshape(2, -1).T
    rois = np.concatenate(
        [np.zeros((len(r), 1)), r, r + np.asarray([[30.0, 24.0]])], axis=1
    ).astype(np.float32)
    out_dense = multilevel_roi_align(
        [d0], jnp.asarray(rois), (2,), (7, 7), finest_scale=20.0,
        max_ratio=3,
    )
    out_lazy = multilevel_roi_align(
        [l0], jnp.asarray(rois), (4,), (7, 7), finest_scale=20.0,
        max_ratio=3,
    )
    a, b = np.asarray(out_dense), np.asarray(out_lazy)
    return a, b, np.abs(a - b) / np.std(a)


def test_lazy_lower_composed_deviation_bounds():
    """Lazy deviates from dense, within measured bounds, in both regimes.

    Measured on random weights (seed 3): smooth fields median ~2.6% /
    p99 ~20% of the level's std (corr 0.998); white-noise-heavy content
    median ~18.5% / p99 ~75% (corr 0.96). These are deviation bounds,
    NOT an exactness claim — the old "exact on linear fields" claim was
    false (the 3x3 conv's tap pitch doubles), which the non-equality
    assert pins down.
    """
    # smooth regime
    dense_outs, lazy_outs, _ = _fpn_pair(np.random.default_rng(3), 0.05)
    a, b, rel = _composed_rel_err(dense_outs, lazy_outs)
    assert rel.max() > 1e-3, "lazy build unexpectedly exact vs dense"
    assert np.median(rel) < 0.08, np.median(rel)
    assert np.quantile(rel, 0.99) < 0.35, np.quantile(rel, 0.99)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99

    # high-frequency regime (worst case for the halved tap pitch)
    dense_outs, lazy_outs, _ = _fpn_pair(np.random.default_rng(3), 0.5)
    a, b, rel = _composed_rel_err(dense_outs, lazy_outs)
    assert np.median(rel) < 0.30, np.median(rel)
    assert np.quantile(rel, 0.99) < 1.1, np.quantile(rel, 0.99)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9


def test_nonlower_levels_identical():
    """lazy_lower must only change the stride-2 level."""
    rng = np.random.default_rng(4)
    dense_outs, lazy_outs, _ = _fpn_pair(rng)
    for d, l in zip(dense_outs[1:], lazy_outs[1:]):
        np.testing.assert_allclose(np.asarray(d), np.asarray(l))


def test_dense_lower_matches_torch_reference():
    """Dense build == torch F.interpolate(bilinear) + conv2d, same weights.

    Verifies the reference-faithful path (the .pth-load default) end to
    end at the op level: jax.image.resize('bilinear') must equal torch's
    align_corners=False upsample, and the 3x3 conv must match.
    """
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 12, 16, 8)).astype(np.float32)
    k = rng.normal(size=(3, 3, 8, 6)).astype(np.float32) * 0.2
    bias = rng.normal(size=(6,)).astype(np.float32)

    up = _upsample_bilinear(jnp.asarray(x), 2)
    y_jax = jax.lax.conv_general_dilated(
        up, jnp.asarray(k), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ut = F.interpolate(xt, scale_factor=2, mode="bilinear",
                       align_corners=False)
    yt = F.conv2d(
        ut, torch.from_numpy(k).permute(3, 2, 0, 1),
        torch.from_numpy(bias), padding=1,
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(y_jax), yt, atol=2e-5)
