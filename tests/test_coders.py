import jax.numpy as jnp
import numpy as np

from monorun_tpu.coders import (

    DimCoder,
    NOCCoder,
    ProjErrorCoder,
    decode_rotation,
    encode_rotation,
)

import pytest

pytestmark = pytest.mark.smoke  # seconds-fast numeric core


def test_dim_coder_roundtrip():
    coder = DimCoder()
    rng = np.random.default_rng(0)
    dims = jnp.asarray(rng.uniform(0.5, 4.0, (8, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 3, (8,)))
    enc = coder.encode(dims, labels)
    dec, _ = coder.decode(enc, None, labels)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dims), atol=1e-5)


def test_dim_coder_variance_decode():
    coder = DimCoder()
    dim_var = jnp.ones((2, 3))
    labels = jnp.asarray([0, 2])
    _, var = coder.decode(jnp.zeros((2, 3)), dim_var, labels)
    stds = np.asarray(coder.target_stds)[np.asarray(labels)]
    np.testing.assert_allclose(np.asarray(var), stds**2, rtol=1e-6)


def test_noc_coder_roundtrip_foreground():
    coder = NOCCoder()
    rng = np.random.default_rng(1)
    n, h, w = 3, 4, 4
    coords = rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (n, h, w, 1)) > 0.5).astype(np.float32)
    dims = rng.uniform(1.0, 3.0, (n, 3)).astype(np.float32)
    flip = np.zeros(n, bool)

    parts, parts_mask = coder.encode(
        jnp.asarray(coords * mask), jnp.asarray(mask), jnp.asarray(dims),
        jnp.asarray(flip),
    )
    # decode undoes the z-score + dims product; mask weighting must be
    # divided out first (the reference trains on mask-weighted encodings).
    dec, _ = coder.decode(
        parts / jnp.clip(parts_mask, 1e-5, None),
        None, jnp.asarray(dims), None, jnp.asarray(flip),
    )
    fg = mask[..., 0] > 0
    np.testing.assert_allclose(
        np.asarray(dec)[fg], coords[fg], atol=1e-4
    )


def test_noc_coder_flip_negates_z():
    coder = NOCCoder()
    coords = np.ones((1, 2, 2, 3), np.float32)
    mask = np.ones((1, 2, 2, 1), np.float32)
    dims = np.ones((1, 3), np.float32)
    enc_noflip, _ = coder.encode(
        jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(dims),
        jnp.asarray([False]),
    )
    enc_flip, _ = coder.encode(
        jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(dims),
        jnp.asarray([True]),
    )
    stds = np.asarray(coder.target_stds)
    means = np.asarray(coder.target_means)
    np.testing.assert_allclose(
        np.asarray(enc_flip[..., 2]), (-1 - means[2]) / stds[2] * 1.0,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(enc_noflip[..., :2]), np.asarray(enc_flip[..., :2])
    )


def test_proj_error_coder_encode_decode_inverse():
    coder = ProjErrorCoder()
    rng = np.random.default_rng(2)
    err = jnp.asarray(rng.normal(size=(4, 5, 5, 2)).astype(np.float32))
    dist = jnp.asarray(rng.uniform(5, 50, (4, 1)).astype(np.float32))
    enc = coder.encode(err, dist)
    dec = coder.decode(enc, dist)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(err), rtol=1e-5)


def test_proj_error_decode_logstd_no_epistemic():
    coder = ProjErrorCoder()
    logstd = jnp.zeros((2, 3, 3, 2))
    dist = jnp.full((2, 1), 10.0)
    out = coder.decode_logstd(logstd, None, dist)
    expected = np.log(coder.scaling_denominator / 10.0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_proj_error_decode_logstd_epistemic_fold():
    coder = ProjErrorCoder()
    n, h, w = 1, 2, 2
    logstd = jnp.full((n, h, w, 2), -1.0)
    var3d = jnp.full((n, h, w, 3), 0.01)
    dist = jnp.full((n, 1), 20.0)
    out = np.asarray(coder.decode_logstd(logstd, var3d, dist))
    # manual: var_u = 0.01, scaled
    var_u = (
        0.01 * coder.ref_focal_y**2
        + np.exp(-2.0) * coder.scaling_denominator**2
    ) / 20.0**2
    np.testing.assert_allclose(out[..., 0], 0.5 * np.log(var_u), rtol=1e-5)


def test_rotation_coder():
    angles = jnp.asarray([0.0, np.pi / 3, -2.5])
    vecs = encode_rotation(angles)
    np.testing.assert_allclose(
        np.asarray(decode_rotation(vecs)), np.asarray(angles), atol=1e-6
    )
    assert vecs.shape == (3, 2)
