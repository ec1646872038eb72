"""Unrolled small-matrix SPD linear algebra (batched, VPU-friendly).

jnp.linalg.{solve, inv, eigvalsh} on batches of 3x3..5x5 matrices lower to
pivoted LU / QR iteration loops that serialise badly on TPU. The PnP
solver only ever factorises SPD matrices (damped Gauss-Newton normal
matrices, Tikhonov-regularised DLT normal matrices), so unrolled Cholesky
is exact, branch-free, and fully elementwise over the batch.

`spd_valid` replaces the reference's eigenvalue guard (pnp_uncert.py:77-85):
a Cholesky with all pivots above a relative floor certifies positive
definiteness directly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray

_EPS = 1e-20


def cholesky_unrolled(a: Array) -> Array:
    """Batched Cholesky for (..., n, n) SPD with small static n.

    Negative pivots are clamped so the factorisation never produces NaN;
    use `spd_valid` to detect non-PD inputs.
    """
    n = a.shape[-1]
    zero = jnp.zeros_like(a[..., 0, 0])
    l_rows = [[zero] * n for _ in range(n)]
    for j in range(n):
        s = a[..., j, j]
        for k in range(j):
            s = s - l_rows[j][k] * l_rows[j][k]
        d = jnp.sqrt(jnp.clip(s, _EPS, None))
        l_rows[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = a[..., i, j]
            for k in range(j):
                s = s - l_rows[i][k] * l_rows[j][k]
            l_rows[i][j] = s * inv_d
    return jnp.stack(
        [jnp.stack(row, axis=-1) for row in l_rows], axis=-2
    )


def cho_solve(l: Array, b: Array) -> Array:
    """Solve A x = b given L = cholesky(A); b (..., n) -> x (..., n)."""
    n = l.shape[-1]
    # forward substitution L y = b
    y = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - l[..., i, k] * y[k]
        y.append(s / l[..., i, i])
    # backward substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l[..., k, i] * x[k]
        x[i] = s / l[..., i, i]
    return jnp.stack(x, axis=-1)


def spd_solve(a: Array, b: Array) -> Array:
    """Batched SPD solve, (..., n, n) x (..., n) -> (..., n)."""
    return cho_solve(cholesky_unrolled(a), b)


def spd_inverse(a: Array) -> Array:
    """Batched SPD inverse via Cholesky; (..., n, n)."""
    n = a.shape[-1]
    l = cholesky_unrolled(a)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    cols = [cho_solve(l, eye[..., j]) for j in range(n)]
    return jnp.stack(cols, axis=-1)


def spd_valid(a: Array, rel: float = 1e-9) -> Array:
    """True where A is comfortably positive definite.

    Checks every Cholesky pivot against a floor relative to the trace —
    the same degeneracy the reference catches with its eigenvalue test.
    """
    n = a.shape[-1]
    l = cholesky_unrolled(a)
    tr = jnp.trace(a, axis1=-2, axis2=-1) / n
    floor = jnp.sqrt(jnp.clip(rel * tr, _EPS, None))
    diag = jnp.stack([l[..., i, i] for i in range(n)], -1)
    return jnp.all(diag > floor[..., None], axis=-1) & jnp.all(
        jnp.isfinite(a), axis=(-2, -1)
    )


def slogdet_spd(a: Array) -> Array:
    """log det of SPD (..., n, n) via Cholesky (2 * sum log diag L)."""
    n = a.shape[-1]
    l = cholesky_unrolled(a)
    s = 0.0
    for i in range(n):
        s = s + jnp.log(l[..., i, i])
    return 2.0 * s
