"""Band-sweep Pallas RoIAlign logic, run in interpret mode on CPU.

Covers the band bucketing / sort / padded-slot scatter / end-aligned
window shift of ops/roi_align_band.py against the gather oracle (itself
tested against reference RoIAlign semantics in test_roi_align.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from unittest import mock

import monorun_tpu.ops.roi_align_band as rab
from monorun_tpu.ops.roi_align import multilevel_roi_align


def _interpret_pallas():
    orig = rab.pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    return mock.patch.object(rab.pl, "pallas_call", patched)


def _pyramid(B=2, H=64, W=128, C=32, strides=(2, 4, 8, 16), seed=0):
    return [
        jnp.asarray(
            np.random.default_rng(seed + l)
            .normal(size=(B, H // s, W // s, C))
            .astype(np.float32)
        )
        for l, s in enumerate(strides)
    ]


def _boxes(n, B, H, W, seed=0, max_w=60.0, max_h=40.0):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, W - 4, n)
    y1 = rng.uniform(0, H - 4, n)
    x2 = np.clip(x1 + rng.uniform(1, max_w, n), None, W)
    y2 = np.clip(y1 + rng.uniform(1, max_h, n), None, H)
    b = rng.integers(0, B, n).astype(np.float32)
    return jnp.asarray(np.stack([b, x1, y1, x2, y2], 1).astype(np.float32))


@pytest.mark.parametrize("mode", ["plain", "tiered", "matmul"])
@pytest.mark.parametrize(
    "out_size,finest,max_ratio", [((7, 7), 10.0, 3), ((14, 14), 14.0, 2)]
)
def test_band_matches_gather_oracle(out_size, finest, max_ratio, mode):
    strides = (2, 4, 8, 16)
    feats = _pyramid()
    rois = _boxes(24, 2, 64, 128)
    ref = multilevel_roi_align(
        feats, rois, strides, out_size, finest,
        sampling_ratio=0, max_ratio=max_ratio, long_span_cap=96 - 18,
    )
    with _interpret_pallas():
        got = rab.multilevel_roi_align_band(
            feats, rois, strides, out_size, finest,
            max_ratio=max_ratio, kroi=4, tiered=mode == "tiered",
            matmul=mode == "matmul",
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_band_extreme_aspect_and_degenerate():
    """Slivers (level cap), padded zero-size RoIs (dummy band slots), and
    boxes straddling band boundaries must all match the oracle."""
    strides = (2, 4, 8, 16)
    feats = _pyramid()
    rois = jnp.asarray(
        np.array(
            [
                [0, 0.0, 0.0, 0.0, 0.0],        # padded slot
                [0, 2.0, 60.0, 120.0, 64.0],    # 118x4 bottom sliver
                [1, 100.0, 0.0, 128.0, 3.0],    # top-right sliver
                [1, 10.0, 10.0, 90.0, 30.0],    # wide ar-4 box
                [0, 5.0, 5.0, 6.5, 6.0],        # tiny box
                [0, 0.0, 28.0, 30.0, 36.0],     # straddles 32-row band edge
            ],
            np.float32,
        )
    )
    ref = multilevel_roi_align(
        feats, rois, strides, (7, 7), 10.0,
        sampling_ratio=0, max_ratio=3, long_span_cap=96 - 18,
    )
    # kroi=2 exercises the unpacked fallback (kroi % KPACK != 0); kroi=4
    # exercises the K-packed kernel on the same degenerate boxes, where
    # one group mixes tiers and contains the zero-size dummy; matmul=True
    # exercises the whole-block stage-1 variant on the same cases
    for kroi, matmul in ((2, False), (4, False), (4, True)):
        with _interpret_pallas():
            got = rab.multilevel_roi_align_band(
                feats, rois, strides, (7, 7), 10.0, max_ratio=3, kroi=kroi,
                matmul=matmul,
            )
        assert np.isfinite(np.asarray(got)).all()
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
