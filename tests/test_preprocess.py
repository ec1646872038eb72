"""On-device preprocessing (data/pipeline.py:device_preprocess) vs the
host-side normalize_pad / cv2-resize chain it replaces (reference
apis/inference.py:51-75 LoadImage -> Normalize -> Pad3D)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from monorun_tpu.config import get_config
from monorun_tpu.data.pipeline import (

    device_preprocess,
    normalize_pad,
    scale_intrinsics,
)

import pytest

pytestmark = pytest.mark.smoke  # seconds-fast numeric core


def _raw(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), np.uint8
    )


def test_device_preprocess_scale1_exact():
    """test_scale == 1: bit-exact vs the host normalize+pad path."""
    cfg = get_config("kitti_multiclass")
    dc = cfg.data
    img = _raw(375, 1242)
    host, (h, w) = normalize_pad(img.astype(np.float32), dc)

    canvas = np.zeros((dc.raw_height, dc.raw_width, 3), np.uint8)
    canvas[:375, :1242] = img
    dev, shapes = device_preprocess(
        jnp.asarray(canvas)[None],
        np.asarray([[375.0, 1242.0]], np.float32), dc,
    )
    np.testing.assert_array_equal(np.asarray(shapes), [[375.0, 1242.0]])
    np.testing.assert_allclose(
        np.asarray(dev[0]), host, rtol=0, atol=1e-6
    )


def test_device_preprocess_downscale_matches_cv2_interior():
    """test_scale = 0.75 vs cv2.INTER_LINEAR resize -> normalize -> pad.

    The two chains sample on slightly different grids (device: exactly
    1/s over the canvas; cv2: h/round(h*s) over the raw image — see
    device_preprocess docstring), so pixel values on arbitrary images
    differ by the local gradient times a sub-pixel offset. Bilinear
    resampling is EXACT on affine images, so a linear ramp isolates the
    grid difference: interior agreement must be at the ramp-slope x
    ~0.4 px level, and padding must stay exactly zero."""
    import cv2

    cfg = get_config("kitti_multiclass_fast")
    dc = cfg.data
    s = dc.test_scale
    assert s == 0.75 and (dc.pad_height, dc.pad_width) == (320, 960)
    yy, xx = np.mgrid[0:375, 0:1242].astype(np.float32)
    img = np.stack([yy * 0.3, xx * 0.1, yy * 0.1 + xx * 0.05], -1)
    nh, nw = int(round(375 * s)), int(round(1242 * s))
    host_img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    host, _ = normalize_pad(host_img, dc)

    canvas = np.zeros((dc.raw_height, dc.raw_width, 3), np.float32)
    canvas[:375, :1242] = img
    dev, shapes = device_preprocess(
        jnp.asarray(canvas)[None],
        np.asarray([[375.0, 1242.0]], np.float32), dc,
    )
    np.testing.assert_array_equal(
        np.asarray(shapes), [[float(nh), float(nw)]]
    )
    d = np.abs(np.asarray(dev[0]) - host)
    # interior of the valid region (2 px margin inside (nh, nw)); ramp
    # slope <= 0.3/px, std ~80 => sub-pixel grid drift stays < 0.005
    assert d[: nh - 2, : nw - 2].max() < 5e-3, d[: nh - 2, : nw - 2].max()
    # padding stays exactly zero in normalized space
    assert np.abs(np.asarray(dev[0])[nh:, :]).max() == 0.0
    assert np.abs(np.asarray(dev[0])[:, nw:]).max() == 0.0


def test_scale_intrinsics():
    cam = np.asarray(
        [[[721.5, 0.0, 609.6], [0.0, 721.5, 172.9], [0.0, 0.0, 1.0]]],
        np.float32,
    )
    out = np.asarray(scale_intrinsics(cam, 0.75))
    np.testing.assert_allclose(out[0, 0, 0], 721.5 * 0.75)
    np.testing.assert_allclose(out[0, 1, 2], 172.9 * 0.75)
    np.testing.assert_allclose(out[0, 2], [0.0, 0.0, 1.0])
    assert scale_intrinsics(cam, 1.0) is cam
