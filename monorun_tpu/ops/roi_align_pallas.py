"""Pallas TPU kernel for multi-level RoIAlign.

XLA's gather lowers the 4-tap sampling to millions of 512-byte random
reads (~7% of HBM bandwidth). This kernel does what the hardware wants:

* the feature pyramid is laid out as one (rows, C) HBM buffer with every
  level's width padded to a multiple of 16 so that any tile row start is
  16-aligned (Mosaic's sublane tiling for bf16),
* per RoI, Th row segments of width Tw are DMA'd into VMEM,
* the aligned output is two small MXU matmuls with per-RoI hat-function
  matrices (Y (oh x Th) @ tile @ X^T (Tw x ow)) folding bilinear weights,
  border rules, and adaptive bin averaging — the same separable math as
  roi_align.multilevel_roi_align_tiled, which is unit-tested against the
  reference RoIAlign semantics.

Grid = RoI blocks; row starts are scalar-prefetched so DMAs issue
immediately at each grid step.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import _axis_interp_matrix, assign_fpn_levels

Array = jnp.ndarray

ALIGN = 16   # row alignment (bf16 sublane tiling)


def _kernel(
    row0_ref,            # (N,) int32 — first tile row per RoI
    wl_ref,              # (N,) int32 — padded level width per RoI
    flat_ref,            # (rows, C) HBM pyramid (padded widths)
    y_ref,               # (2*KROI, oh, Th) VMEM
    x_ref,               # (2*KROI, ow, Tw) VMEM
    out_ref,             # (2*KROI, oh, ow, C) VMEM
    tile0_ref,           # (KROI, Th, Tw, C) VMEM scratch, half 0
    tile1_ref,           # (KROI, Th, Tw, C) VMEM scratch, half 1
    sem,                 # DMA semaphores (2, KROI)
    *,
    kroi: int,
    th: int,
    tw: int,
):
    """Double-buffered pipeline, two half-blocks per grid step.

    Each grid step owns 2*kroi RoIs (halves 0 and 1). Half h's tiles are
    DMA'd while the previous half computes: the kernel issues half 1
    before computing half 0, and issues the *next step's* half 0 before
    computing half 1. All scratch indices are static (Mosaic cannot
    shape-cast dynamically indexed VMEM slices), so no predicated compute
    is needed — only the DMA issues are bounds-guarded.
    """
    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    tiles = (tile0_ref, tile1_ref)

    def dma(step, half, r, k):
        i = (step * 2 + half) * kroi + r
        # row0, wl, and x-origins are all ALIGN-multiples by construction.
        # One semaphore per RoI (not per row): sflag space is tiny, and
        # waiting once per issued copy on the shared semaphore is exact.
        start = pl.multiple_of(row0_ref[i] + k * wl_ref[i], ALIGN)
        return pltpu.make_async_copy(
            flat_ref.at[pl.ds(start, tw), :],
            tiles[half].at[r, k],
            sem.at[half, r],
        )

    def issue(step, half):
        for r in range(kroi):
            for k in range(th):
                dma(step, half, r, k).start()

    def compute(half):
        c = tile0_ref.shape[-1]
        for r in range(kroi):
            for k in range(th):
                dma(blk, half, r, k).wait()
            tile = tiles[half][r].reshape(th, tw * c)
            o = half * kroi + r
            t1 = jnp.dot(
                y_ref[o], tile, preferred_element_type=jnp.float32
            ).reshape(-1, tw, c)                    # (oh, Tw, C)
            out = jax.lax.dot_general(
                x_ref[o], t1,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (ow, oh, C)
            out_ref[o] = jnp.swapaxes(out, 0, 1).astype(out_ref.dtype)

    @pl.when(blk == 0)
    def _():
        issue(0, 0)

    issue(blk, 1)
    compute(0)

    @pl.when(blk + 1 < nblk)
    def _():
        issue(blk + 1, 0)

    compute(1)


def _pad_width(w: int) -> int:
    return -(-w // ALIGN) * ALIGN


# guard rows appended after the pyramid so row-segment overruns of any
# supported tile size land in zeros ((Th+2) * Tw worst case)
MAX_TH, MAX_TW = 32, 96


def prepare_flat_pyramid(features: Sequence[Array]):
    """Dual-orientation flat pyramid shared across align calls.

    Returns (flat (rows, C), sizes, wpads, hpads, offs_rm, offs_t, total, B).

    Every level is stored twice: row-major (rows indexed by y, row length
    = padded W) and transposed (rows indexed by x, row length = padded H).
    Each RoI later reads the orientation whose *short* axis is the tile's
    row dimension: the short side of an RoI at its mmdet-assigned level is
    bounded by its finest_scale (~<=22/30 rows incl. halo) for ANY aspect
    ratio, while the long side (up to finest*sqrt(aspect)) fits in the
    wide in-row direction. A single-orientation tile silently clips tall
    RoIs (pedestrians) — this layout makes the tile exact for aspect
    ratios up to ((Tw-18)/finest)^2.

    Build once per forward — the pad+concat+transpose copies the pyramid
    (~2 x 85 MB/img), pure HBM traffic wasted if repeated.
    """
    B = features[0].shape[0]
    C = features[0].shape[-1]
    fdtype = features[0].dtype
    sizes = [(f.shape[1], f.shape[2]) for f in features]
    wpads = [_pad_width(w) for _, w in sizes]
    hpads = [_pad_width(h) for h, _ in sizes]
    offs_rm, offs_t = [], []
    off = 0
    for (h, _), wp in zip(sizes, wpads):
        offs_rm.append(off)
        off += h * wp
    for (_, w), hp in zip(sizes, hpads):
        offs_t.append(off)
        off += w * hp
    total = off
    parts = []
    for f, (h, w), wp in zip(features, sizes, wpads):
        if wp != w:
            f = jnp.pad(f, ((0, 0), (0, 0), (0, wp - w), (0, 0)))
        parts.append(f.reshape(B, -1, C))
    for f, (h, w), hp in zip(features, sizes, hpads):
        ft = jnp.swapaxes(f, 1, 2)                      # (B, W, H, C)
        if hp != h:
            ft = jnp.pad(ft, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
        parts.append(ft.reshape(B, -1, C))
    flat = jnp.concatenate(parts, axis=1).reshape(B * total, C)
    flat = jnp.concatenate(
        [flat, jnp.zeros(((MAX_TH + 2) * MAX_TW, C), fdtype)], axis=0
    )
    return (
        flat, tuple(sizes), tuple(wpads), tuple(hpads),
        tuple(offs_rm), tuple(offs_t), total, B,
    )


def multilevel_roi_align_pallas(
    features: Sequence[Array],   # per level (B, H_l, W_l, C)
    rois: Array,                 # (n, 5)
    strides: Sequence[int],
    out_size: Tuple[int, int],
    finest_scale: float = 56.0,
    max_ratio: int = 3,
    tile_hw: Tuple[int, int] = (24, 64),
    kroi: int = 8,
    pyramid=None,                # optional prepare_flat_pyramid output
) -> Array:
    """Pallas-backed RoIAlign; semantics == multilevel_roi_align.

    Each RoI reads from the orientation of the dual pyramid whose short
    axis maps to the Th tile rows (see prepare_flat_pyramid), so tall and
    wide RoIs are both covered exactly; the kernel's output for transposed
    RoIs comes back (ow, oh)-ordered and is swapped afterwards.
    """
    C = features[0].shape[-1]
    oh, ow = out_size
    assert oh == ow, "dual-orientation tiles require square outputs"
    n = rois.shape[0]
    L = len(features)
    Th, Tw = tile_hw
    assert Tw % ALIGN == 0, Tw
    assert Th <= MAX_TH and Tw <= MAX_TW, (Th, Tw)
    fdtype = features[0].dtype

    if pyramid is None:
        pyramid = prepare_flat_pyramid(features)
    flat, sizes, wpads, hpads, offs_rm, offs_t, total, B = pyramid

    stride_arr = jnp.asarray([float(s) for s in strides])
    h_arr = jnp.asarray([h for h, _ in sizes], jnp.float32)
    w_arr = jnp.asarray([w for _, w in sizes], jnp.float32)
    wpad_arr = jnp.asarray(wpads, jnp.int32)
    hpad_arr = jnp.asarray(hpads, jnp.int32)
    offrm_arr = jnp.asarray(offs_rm, jnp.int32)
    offt_arr = jnp.asarray(offs_t, jnp.int32)

    n_pad = (-n) % (2 * kroi)
    if n_pad:
        rois = jnp.concatenate([rois, jnp.zeros((n_pad, 5), rois.dtype)], 0)
    m = rois.shape[0]

    lvls = assign_fpn_levels(rois, L, finest_scale)
    Hn = h_arr[lvls]
    Wn = w_arr[lvls]
    boxes = rois[:, 1:5] / stride_arr[lvls][:, None] - 0.5
    x1, y1, x2, y2 = [boxes[:, i] for i in range(4)]
    bw = (x2 - x1) / ow
    bh = (y2 - y1) / oh
    gw = jnp.clip(jnp.ceil((x2 - x1) / ow), 1, max_ratio)
    gh = jnp.clip(jnp.ceil((y2 - y1) / oh), 1, max_ratio)

    k = jnp.arange(max_ratio, dtype=jnp.float32)
    iy = jnp.arange(oh, dtype=jnp.float32)
    ix = jnp.arange(ow, dtype=jnp.float32)
    ys = (
        y1[:, None, None] + iy[None, :, None] * bh[:, None, None]
        + (k[None, None, :] + 0.5) * bh[:, None, None] / gh[:, None, None]
    )
    xs = (
        x1[:, None, None] + ix[None, :, None] * bw[:, None, None]
        + (k[None, None, :] + 0.5) * bw[:, None, None] / gw[:, None, None]
    )
    my = (k[None, None, :] < gh[:, None, None])
    mx = (k[None, None, :] < gw[:, None, None])

    # orientation: the shorter roi axis becomes the tile's row axis
    tmask = (y2 - y1) > (x2 - x1)                  # tall -> transposed
    tm = tmask[:, None, None]
    a_coords = jnp.where(tm, xs, ys)               # tile-row axis samples
    b_coords = jnp.where(tm, ys, xs)               # in-row axis samples
    ga = jnp.where(tmask, gw, gh)
    gb = jnp.where(tmask, gh, gw)
    ma = jnp.where(tm, mx, my)
    mb = jnp.where(tm, my, mx)
    A_size = jnp.where(tmask, Wn, Hn)
    B_size = jnp.where(tmask, Hn, Wn)

    a0 = jnp.clip(jnp.floor(jnp.clip(a_coords.min(axis=(1, 2)), 0.0, None)),
                  0.0, jnp.clip(A_size - Th, 0.0, None))
    # in-row origin snapped DOWN to the alignment so every tile row start
    # (base + a0 * rowlen + b0) is a multiple of ALIGN
    b0 = jnp.clip(jnp.floor(jnp.clip(b_coords.min(axis=(1, 2)), 0.0, None)),
                  0.0, jnp.clip(B_size - Tw, 0.0, None))
    b0 = jnp.floor(b0 / ALIGN) * ALIGN

    Y = _axis_interp_matrix(a_coords, ma[:, :1], ga, a0, A_size, Th
                            ).astype(fdtype)
    X = _axis_interp_matrix(b_coords, mb[:, :1], gb, b0, B_size, Tw
                            ).astype(fdtype)

    rowlen = jnp.where(tmask, hpad_arr[lvls], wpad_arr[lvls])
    off = jnp.where(tmask, offt_arr[lvls], offrm_arr[lvls])
    base = rois[:, 0].astype(jnp.int32) * total + off
    row0 = (base + a0.astype(jnp.int32) * rowlen + b0.astype(jnp.int32)
            ).astype(jnp.int32)

    grid = m // (2 * kroi)
    out = pl.pallas_call(
        functools.partial(_kernel, kroi=kroi, th=Th, tw=Tw),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),       # flat pyramid
                pl.BlockSpec((2 * kroi, oh, Th), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec((2 * kroi, ow, Tw), lambda i, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (2 * kroi, oh, ow, C), lambda i, *_: (i, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((kroi, Th, Tw, C), fdtype),
                pltpu.VMEM((kroi, Th, Tw, C), fdtype),
                pltpu.SemaphoreType.DMA((2, kroi)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((m, oh, ow, C), fdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(row0, rowlen, flat, Y, X)
    # transposed rois come back (ow, oh)-ordered
    out = jnp.where(
        tmask[:, None, None, None], jnp.swapaxes(out, 1, 2), out
    )
    return out[:n]
