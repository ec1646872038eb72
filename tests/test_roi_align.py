import jax.numpy as jnp
import numpy as np

from monorun_tpu.ops.roi_align import (
    multilevel_roi_align,
    roi_align,
    roi_grid_centers,
)


def _bilinear_np(feat, y, x):
    """mmcv-style bilinear with border rules; feat (H, W, C)."""
    H, W, _ = feat.shape
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return 0.0
    y = min(max(y, 0.0), H - 1)
    x = min(max(x, 0.0), W - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    return (
        feat[y0, x0] * (1 - ly) * (1 - lx)
        + feat[y0, x1] * (1 - ly) * lx
        + feat[y1, x0] * ly * (1 - lx)
        + feat[y1, x1] * ly * lx
    )


def _roi_align_np(feat, box, out, scale, ratio):
    """Reference aligned=True RoIAlign, adaptive if ratio == 0."""
    oh, ow = out
    x1, y1, x2, y2 = [b * scale - 0.5 for b in box]
    rw, rh = x2 - x1, y2 - y1
    bw, bh = rw / ow, rh / oh
    gw = ratio if ratio > 0 else max(1, int(np.ceil(rw / ow)))
    gh = ratio if ratio > 0 else max(1, int(np.ceil(rh / oh)))
    res = np.zeros((oh, ow, feat.shape[-1]), np.float64)
    for i in range(oh):
        for j in range(ow):
            acc = 0.0
            for ky in range(gh):
                for kx in range(gw):
                    y = y1 + i * bh + (ky + 0.5) * bh / gh
                    x = x1 + j * bw + (kx + 0.5) * bw / gw
                    acc = acc + _bilinear_np(feat, y, x)
            res[i, j] = acc / (gh * gw)
    return res


def test_roi_align_fixed_ratio_matches_reference():
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(2, 16, 20, 3)).astype(np.float32)
    rois = np.array(
        [[0, 2.0, 3.0, 14.0, 11.0], [1, 0.5, 0.5, 19.0, 15.0]], np.float32
    )
    out = roi_align(jnp.asarray(feat), jnp.asarray(rois), (7, 7),
                    spatial_scale=1.0, sampling_ratio=2)
    for r in range(2):
        ref = _roi_align_np(feat[int(rois[r, 0])], rois[r, 1:], (7, 7), 1.0, 2)
        np.testing.assert_allclose(np.asarray(out)[r], ref, atol=1e-4)


def test_roi_align_adaptive_matches_reference():
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(1, 24, 24, 2)).astype(np.float32)
    # big roi -> grid 3; small roi -> grid 1
    rois = np.array(
        [[0, 1.0, 1.0, 22.0, 22.0], [0, 5.0, 5.0, 9.0, 8.0]], np.float32
    )
    out = roi_align(jnp.asarray(feat), jnp.asarray(rois), (7, 7),
                    sampling_ratio=0, max_ratio=4)
    for r in range(2):
        ref = _roi_align_np(feat[0], rois[r, 1:], (7, 7), 1.0, 0)
        np.testing.assert_allclose(np.asarray(out)[r], ref, atol=1e-4)


def test_roi_align_spatial_scale():
    rng = np.random.default_rng(2)
    feat = rng.normal(size=(1, 10, 12, 1)).astype(np.float32)
    rois = np.array([[0, 8.0, 4.0, 40.0, 36.0]], np.float32)
    out = roi_align(jnp.asarray(feat), jnp.asarray(rois), (4, 4),
                    spatial_scale=0.25, sampling_ratio=2)
    ref = _roi_align_np(feat[0], rois[0, 1:], (4, 4), 0.25, 2)
    np.testing.assert_allclose(np.asarray(out)[0], ref, atol=1e-4)


def test_multilevel_matches_single_level():
    """RoIs sized to land on specific levels must match direct aligns."""
    rng = np.random.default_rng(3)
    B, C = 1, 4
    strides = [4, 8]
    feats = [
        rng.normal(size=(B, 32, 40, C)).astype(np.float32),
        rng.normal(size=(B, 16, 20, C)).astype(np.float32),
    ]
    # finest_scale 20: scale<~40 -> level0, bigger -> level1
    rois = np.array(
        [[0, 10, 10, 40, 38], [0, 5, 5, 120, 100]], np.float32
    )
    out = multilevel_roi_align(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), strides,
        (7, 7), finest_scale=20.0, sampling_ratio=0, max_ratio=4,
    )
    lvl_expect = [0, 1]
    for r, lvl in enumerate(lvl_expect):
        single = roi_align(
            jnp.asarray(feats[lvl]), jnp.asarray(rois[r : r + 1]), (7, 7),
            spatial_scale=1.0 / strides[lvl], sampling_ratio=0, max_ratio=4,
        )
        np.testing.assert_allclose(
            np.asarray(out)[r], np.asarray(single)[0], atol=1e-5
        )


def test_roi_grid_centers_equals_roi_align_of_coord2d():
    """Analytic bin centers == RoIAlign of the dense (u, v) pixel field."""
    H, W = 32, 48
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    coord2d = np.stack([uu, vv], -1)[None]  # (1, H, W, 2)
    rois = np.array([[0, 3.0, 4.0, 27.0, 21.0]], np.float32)
    analytic = roi_grid_centers(jnp.asarray(rois), (28, 28))
    aligned = roi_align(
        jnp.asarray(coord2d), jnp.asarray(rois), (28, 28),
        sampling_ratio=2,
    )
    np.testing.assert_allclose(
        np.asarray(analytic)[0], np.asarray(aligned)[0], atol=1e-3
    )


def test_tiled_matches_gather():
    """The tiled separable formulation must equal the 4-tap gather."""
    from monorun_tpu.ops.roi_align import multilevel_roi_align_tiled

    rng = np.random.default_rng(7)
    B, C = 2, 8
    strides = [2, 4, 8, 16, 32]
    H, W = 64, 128
    feats = [
        jnp.asarray(
            rng.normal(size=(B, H // s, W // s, C)).astype(np.float32)
        )
        for s in strides
    ]
    # RoIs spanning all levels incl. a full-image box (clamped top level)
    rois = np.array(
        [
            [0, 4.0, 4.0, 40.0, 30.0],
            [0, 0.0, 0.0, 127.0, 63.0],
            [1, 10.0, 8.0, 90.0, 60.0],
            [1, 2.0, 2.0, 20.0, 14.0],
            [0, 50.0, 20.0, 55.0, 24.0],
        ],
        np.float32,
    )
    ref = multilevel_roi_align(
        feats, jnp.asarray(rois), strides, (7, 7), finest_scale=20.0,
        max_ratio=3,
    )
    tiled = multilevel_roi_align_tiled(
        feats, jnp.asarray(rois), strides, (7, 7), finest_scale=20.0,
        max_ratio=3, tile_hw=(24, 44),
    )
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(ref), atol=2e-4
    )


def test_tiled_matches_gather_noc_shape():
    from monorun_tpu.ops.roi_align import multilevel_roi_align_tiled

    rng = np.random.default_rng(8)
    strides = [2, 4, 8, 16, 32]
    feats = [
        jnp.asarray(
            rng.normal(size=(1, 64 // s, 128 // s, 4)).astype(np.float32)
        )
        for s in strides
    ]
    rois = np.array(
        [[0, 5.0, 6.0, 70.0, 50.0], [0, 0.0, 0.0, 120.0, 60.0]], np.float32
    )
    ref = multilevel_roi_align(
        feats, jnp.asarray(rois), strides, (14, 14), finest_scale=28.0,
        max_ratio=2,
    )
    tiled = multilevel_roi_align_tiled(
        feats, jnp.asarray(rois), strides, (14, 14), finest_scale=28.0,
        max_ratio=2, tile_hw=(32, 44),
    )
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref), atol=2e-4)


def test_lazy_lower_sampling_equivalence():
    """Stride-4 sampling of the base map vs stride-2 sampling of up2(base).

    The lazy FPN lower level (NeckConfig.lazy_lower) samples the stride-4
    conv output directly where the reference samples its bilinear 2x
    upsample. On any locally-LINEAR field the two interpolants coincide,
    so equality there verifies all coordinate bookkeeping (scale, the
    aligned -0.5 offset, bin geometry). On general fields they differ only
    by the upsample's knot smoothing — second-order in the feature's
    local curvature (the half-pixel up2 re-interpolates across base-cell
    kinks) — bounded here on unit-normal noise.
    """
    import jax

    rng = np.random.default_rng(7)
    B, C = 2, 8
    yy, xx = np.meshgrid(
        np.arange(24, dtype=np.float32), np.arange(32, dtype=np.float32),
        indexing="ij",
    )
    linear = np.stack([yy, xx, 2 * yy - 3 * xx + 1, yy + xx], -1)
    linear = np.broadcast_to(linear, (B, 24, 32, 4)).astype(np.float32)
    noise = rng.normal(size=(B, 24, 32, C)).astype(np.float32)
    rois = np.array(
        [
            [0, 12.0, 10.0, 50.0, 40.0],
            [1, 30.5, 17.25, 95.0, 80.5],
            [0, 8.0, 8.0, 30.0, 60.0],
        ],
        np.float32,
    )  # image coords, interior of the 128x96 px extent

    def pair(base):
        up = jax.image.resize(
            jnp.asarray(base),
            (B, 2 * base.shape[1], 2 * base.shape[2], base.shape[-1]),
            method="bilinear",
        )
        out_up = roi_align(
            up, jnp.asarray(rois), (7, 7), spatial_scale=0.5,
            sampling_ratio=2,
        )
        out_base = roi_align(
            jnp.asarray(base), jnp.asarray(rois), (7, 7),
            spatial_scale=0.25, sampling_ratio=2,
        )
        return np.asarray(out_up), np.asarray(out_base)

    a, b = pair(linear)
    np.testing.assert_allclose(a, b, atol=1e-4)  # exact modulo fp
    a, b = pair(noise)
    assert np.abs(a - b).max() < 0.5  # second-order smoothing bound
    assert np.abs(a - b).mean() < 0.08
