"""Pallas TPU kernel for multi-level RoIAlign.

XLA's gather lowers the 4-tap sampling to millions of 512-byte random
reads (~7% of HBM bandwidth). This kernel does what the hardware wants:

* every pyramid level is laid out as a 3-D ``(B*rows, row_len, C)`` HBM
  buffer (row-major and transposed orientations): dimension 0 is untiled,
  so each RoI's tile is ONE strided DMA at an arbitrary row origin — the
  previous per-row-segment scheme issued Th copies of 32 KB per RoI and
  was DMA-issue-bound (measured 21 ms for 4000 RoIs at batch 4; the
  single-copy layout removes ~24x of the issue overhead). The in-row
  (sublane) origin is snapped down to the bf16 tile multiple of 16, which
  the tile width budgets for.
* per RoI, the aligned output is two small MXU matmuls with per-RoI
  hat-function matrices (Y (oh x Th) @ tile @ X^T (Tw x ow)) folding
  bilinear weights, border rules, and adaptive bin averaging — the same
  separable math as roi_align.multilevel_roi_align_tiled, which is
  unit-tested against the reference RoIAlign semantics.
* double-buffered: each grid step owns two half-blocks of RoIs and
  overlaps half h's DMA with half (1-h)'s compute.

Grid = RoI blocks; buffer ids / row / column origins are scalar-prefetched
so DMAs issue immediately at each grid step.
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

# guard rows appended after each level buffer so row overruns of the last
# image land in zeros; also the minimum padded in-row extent so any tile
# width up to MAX_TW stays in bounds
MAX_TH, MAX_TW = 32, 96

# minimum buffer rows (and padded-path guard row count): the band-sweep
# kernel (roi_align_band.py) DMAs fixed 64-row windows, so every buffer
# must hold at least one
GUARD_ROWS = 64


# quadrant granularity of the conditional tile DMA (see _kernel)
ROW_BLK, COL_BLK = 16, 32


def _kernel(
    buf_ref,             # (N,) int32 — which of the 2L level buffers
    r0_ref,              # (N,) int32 — first tile row in that buffer
    c0_ref,              # (N,) int32 — in-row origin (16-aligned)
    nrb_ref,             # (N,) int32 — row blocks of 16 actually touched
    ncb_ref,             # (N,) int32 — col blocks of 32 actually touched
    *refs,
    nbufs: int,
    kroi: int,
    th: int,
    tw: int,
):
    """refs = [buf_0..buf_{2L-1}, y_ref, x_ref, out_ref, tile0, tile1, sem].

    Double-buffered: issue half 1, compute half 0 (waiting per-RoI),
    issue next step's half 0, compute half 1.

    Each RoI issues exactly ONE copy whose static shape is picked from a
    (row blocks of 16) x (col blocks of 32) tier table by the RoI's
    actual tap extent (nrb/ncb, computed with the interp matrices
    host-side). Tiles are sized for the worst RoI at the level, but the
    typical RoI sits near the lower scale boundary and touches only the
    smallest tier — the fetch is ~85% HBM-bandwidth-bound (halving tile
    bytes measured 7.5 -> 5.0 -> 3.7 ms/call at 4008 RoIs), so adaptive
    bytes ~halve the cost. One copy per RoI is load-bearing: fetching
    the same bytes as 2-6 per-quadrant DMAs measured 16-19 ms/call
    (descriptor-issue-bound), WORSE than the full unconditional fetch.
    Unfetched tile regions hold stale-but-finite VMEM data (zeroed at
    block 0) that the interp matmuls annihilate with exact 0.0 weights.
    """
    bufs = refs[:nbufs]
    y_ref, x_ref, out_ref, tile0_ref, tile1_ref, sem = refs[nbufs:]
    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    tiles = (tile0_ref, tile1_ref)
    nrq = th // ROW_BLK
    ncq = tw // COL_BLK

    def dma(step, half, r, b, rb, cb):
        i = (step * 2 + half) * kroi + r
        c0 = pl.multiple_of(c0_ref[i], 16)
        return pltpu.make_async_copy(
            bufs[b].at[
                pl.ds(r0_ref[i], rb * ROW_BLK),
                pl.ds(c0, cb * COL_BLK),
                :,
            ],
            tiles[half].at[
                r,
                pl.ds(0, rb * ROW_BLK),
                pl.ds(0, cb * COL_BLK),
                :,
            ],
            sem.at[half, r],
        )

    def for_tier(i, fn):
        # nrq * ncq predicated regions per RoI, exactly one of which
        # fires; fn(rb, cb) must issue/wait a single tier-shaped copy
        for rb in range(1, nrq + 1):
            for cb in range(1, ncq + 1):
                @pl.when((nrb_ref[i] == rb) & (ncb_ref[i] == cb))
                def _():
                    fn(rb, cb)

    def issue(step, half):
        for r in range(kroi):
            i = (step * 2 + half) * kroi + r
            for b in range(nbufs):
                @pl.when(buf_ref[i] == b)
                def _():
                    for_tier(
                        i, lambda rb, cb: dma(step, half, r, b, rb, cb).start()
                    )

    def compute(half):
        c = tile0_ref.shape[-1]
        for r in range(kroi):
            i = (blk * 2 + half) * kroi + r
            for b in range(nbufs):
                @pl.when(buf_ref[i] == b)
                def _():
                    for_tier(
                        i, lambda rb, cb: dma(blk, half, r, b, rb, cb).wait()
                    )
            o = half * kroi + r

            def comp(rb, cb):
                # tier-shaped interp matmuls: the zero-weight Y/X columns
                # beyond the fetched extent contribute nothing, and the
                # full (Th, Tw) product at M=oh wastes MXU area on every
                # small RoI (full-tile compute measured ~2.6x slower at
                # the bbox-head mix)
                rws, cls = rb * ROW_BLK, cb * COL_BLK
                # contract the ROW dim of the 3D tile directly: reshaping
                # to (rws, cls*C) first relayouts the tile through the
                # sublanes (band kernel A/B: 19.4 -> 16.4 ms at 8k RoIs)
                t1 = jax.lax.dot_general(
                    y_ref[o][:, :rws], tiles[half][r, :rws, :cls, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                       # (oh, cls, C)
                out = jax.lax.dot_general(
                    x_ref[o][:, :cls], t1,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                       # (ow, oh, C)
                out_ref[o] = out.astype(out_ref.dtype)   # (ow, oh, C) raw

            for_tier(i, comp)

    @pl.when(blk == 0)
    def _():
        # never-fetched quadrants must hold finite data: 0 * NaN = NaN
        tile0_ref[...] = jnp.zeros_like(tile0_ref)
        tile1_ref[...] = jnp.zeros_like(tile1_ref)
        issue(0, 0)

    issue(blk, 1)
    compute(0)

    @pl.when(blk + 1 < nblk)
    def _():
        issue(blk + 1, 0)

    compute(1)


def prepare_flat_pyramid(features: Sequence[Array]):
    """Dual-orientation per-level 2-D buffers shared across align calls.

    Returns (bufs, sizes, B) where bufs[2*l] is level l row-major as
    ``(B*H_l + MAX_TH, max(W_l, MAX_TW) * C)`` and bufs[2*l + 1] is the
    transposed orientation ``(B*W_l + MAX_TH, max(H_l, MAX_TW) * C)``.

    Each RoI later reads the orientation whose *short* axis is the tile's
    row dimension: the short side of an RoI at its mmdet-assigned level is
    bounded by its finest_scale (~<=22/30 rows incl. halo) for ANY aspect
    ratio, while the long side (up to finest*sqrt(aspect)) fits in the
    wide in-row direction. A single-orientation tile silently clips tall
    RoIs (pedestrians).

    Build once per forward — the pad+concat+transpose copies the pyramid,
    pure HBM traffic wasted if repeated.

    Zero-copy fast path: a buffer whose row count covers MAX_TH tile rows
    (rows >= MAX_TH) and whose row length is a multiple of the bf16
    sublane snap (16) with >= MAX_TW columns needs NO pad, concat, or
    guard rows at all:

    * vertically, the kernel's tile origin ``a0`` is clamped to
      ``[0, rows - Th]`` per image, so reads never cross an image (or the
      buffer end);
    * in-row, the origin formula ``snap16(clip(b, 0, W - Tw + 15))``
      equals ``snap16(clip(b, 0, W - Tw))`` whenever ``W % 16 == 0`` —
      the +15 slack allowance is never actually used, so the DMA window
      ``[c0, c0 + Tw)`` stays inside the level row while still covering
      every in-bounds tap (tap spans <= Tw - 15 by the tile budget).

    At 384x1280 that makes strides 2/4/8 row-major and 2/4 transposed
    pure reshapes — the pad+concat chain measured 10.9 ms of the 12.5 ms
    build at b4; this cuts the build to the two large-level transposes
    (~1.5 ms) plus tiny small-level pads.
    """
    B = features[0].shape[0]
    C = features[0].shape[-1]
    fdtype = features[0].dtype
    sizes = [(f.shape[1], f.shape[2]) for f in features]
    bufs = []

    def flat(f3):
        """(B, rows, rlen, C) -> padded/guarded or zero-copy 3-D buffer."""
        _, rows, rlen, _ = f3.shape
        if (rows >= MAX_TH and B * rows >= GUARD_ROWS
                and rlen >= MAX_TW and rlen % 16 == 0):
            return f3.reshape(B * rows, rlen, C)
        # +16 in-row slack: the 16-snapped tile origin may sit up to 15
        # columns left of the right-edge-clipped ideal, so reads can
        # extend up to 15 columns past the level extent (zero-weighted
        # taps); guard rows catch vertical overruns of short buffers AND
        # guarantee >= GUARD_ROWS rows for the band-sweep kernel's fixed
        # 64-row band windows. rp is rounded up to the 16-column sublane
        # snap so the band-matmul kernel's panel origins (rp - panel
        # width) stay 16-aligned for any level size.
        rp = -(-max(rlen, MAX_TW) // 16) * 16 + 16
        g = jnp.pad(f3, ((0, 0), (0, 0), (0, rp - rlen), (0, 0)))
        g = g.reshape(B * rows, rp, C)
        guard = max(MAX_TH, GUARD_ROWS - B * rows)
        return jnp.concatenate(
            [g, jnp.zeros((guard, rp, C), fdtype)], axis=0
        )

    for f in features:
        bufs.append(flat(f))
        bufs.append(flat(jnp.swapaxes(f, 1, 2)))
    return tuple(bufs), tuple(sizes), B


def roi_tile_geometry(
    rois: Array,                 # (m, 5) image coords (already padded)
    sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    out_size: Tuple[int, int],
    finest_scale: float,
    max_ratio: int,
    Th: int,
    Tw: int,
    fdtype,
    row_window: bool = False,
    return_axis_data: bool = False,
):
    """Shared per-RoI tile geometry for the Pallas align kernels.

    Returns (tmask, Y, X, r0, c0, nrb, ncb, buf_id): dual-orientation
    level/tile assignment, interp matrices, tile origins and the touched
    (16-row, 32-col) block tier. Both the per-RoI-DMA kernel and the
    band-sweep kernel consume exactly this geometry, so they are
    numerically identical by construction.

    With ``row_window=True`` (band-sweep kernel), the returned ``r0`` is
    instead the origin of a fixed Th-row read window aligned to the
    tile's LAST touched row block, clipped at buffer row 0 —
    ``max(r0 + nrb * ROW_BLK - Th, 0)`` — and ``Y`` is built directly at
    that origin (leading window rows before the tile get exact 0.0
    weights; for images past the first the window may dip into the
    previous image's rows, likewise zero-weighted). Building Y at the
    window origin here is load-bearing: shifting it afterwards with
    take_along_axis lowers to an elementwise gather that measured
    20.7 ms/step at 8k RoIs — more than the align kernel itself.
    """
    oh, ow = out_size
    L = len(sizes)
    stride_arr = jnp.asarray([float(s) for s in strides])
    h_arr = jnp.asarray([h for h, _ in sizes], jnp.float32)
    w_arr = jnp.asarray([w for _, w in sizes], jnp.float32)

    # the long-side cap guarantees every nonzero-weight tap fits the
    # (Th, Tw) tile even after the 16-snap of the in-row origin: a span
    # of s cells touches at most s + 2 cols, plus <= 15 snap + 1 => Tw.
    # The short side is bounded by the geometric scale (< 2 * finest /
    # stride0 cells), which Th must budget for.
    assert 2.0 * finest_scale / strides[0] <= Th - 2, (finest_scale, Th)
    lvls = assign_fpn_levels(rois, L, finest_scale,
                             long_span_cap=Tw - 18,
                             stride0=float(strides[0]))
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
    # in-row origin snapped DOWN to the bf16 sublane tile (16) so the DMA
    # source slice start is provably aligned; the upper clip allows up to
    # +15 so right-edge RoIs keep full coverage after the snap (the
    # pyramid buffers carry 16 columns of zero slack for the overrun)
    b0 = jnp.clip(jnp.floor(jnp.clip(b_coords.min(axis=(1, 2)), 0.0, None)),
                  0.0, jnp.clip(B_size - Tw + 15.0, 0.0, None))
    b0 = jnp.floor(b0 / 16.0) * 16.0

    # last tile row/col any nonzero-weight tap touches: bilinear upper tap
    # floor(coord)+1, border-clamped to the level extent (mask out the
    # adaptive-sampling slots k >= g, whose coords overshoot the bin)
    neg = jnp.float32(-1e9)
    a_hi = jnp.max(jnp.where(ma, a_coords, neg), axis=(1, 2))
    b_hi = jnp.max(jnp.where(mb, b_coords, neg), axis=(1, 2))
    a_hi = jnp.minimum(jnp.floor(a_hi) + 1.0, A_size - 1.0)
    b_hi = jnp.minimum(jnp.floor(b_hi) + 1.0, B_size - 1.0)
    nrb = jnp.clip(jnp.floor((a_hi - a0) / ROW_BLK), 0, Th // ROW_BLK - 1
                   ).astype(jnp.int32) + 1
    ncb = jnp.clip(jnp.floor((b_hi - b0) / COL_BLK), 0, Tw // COL_BLK - 1
                   ).astype(jnp.int32) + 1

    # tile-row count of the chosen buffer (H row-major, W transposed)
    rows = jnp.where(tmask, Wn, Hn).astype(jnp.int32)
    batch = rois[:, 0].astype(jnp.int32)
    r0 = batch * rows + a0.astype(jnp.int32)
    if row_window:
        r0 = jnp.maximum(r0 + nrb * ROW_BLK - Th, 0)
        a0 = (r0 - batch * rows).astype(jnp.float32)

    Y = _axis_interp_matrix(a_coords, ma[:, :1], ga, a0, A_size, Th
                            ).astype(fdtype)
    X = _axis_interp_matrix(b_coords, mb[:, :1], gb, b0, B_size, Tw
                            ).astype(fdtype)
    c0 = b0.astype(jnp.int32)
    buf_id = (lvls * 2 + tmask.astype(jnp.int32)).astype(jnp.int32)
    out = (tmask, Y, X, r0, c0, nrb, ncb, buf_id)
    if return_axis_data:
        # raw tile-row-axis data so callers can rebuild Y at a different
        # origin/width (the band-matmul kernel builds Y over the full
        # 64-row band window); ``rows`` converts buffer rows back to
        # image-relative origins (a0_img = r - batch * rows)
        out = out + ((a_coords, ma[:, :1], ga, A_size, batch, rows),)
    return out


def multilevel_roi_align_pallas(
    features: Sequence[Array],   # per level (B, H_l, W_l, C)
    rois: Array,                 # (n, 5)
    strides: Sequence[int],
    out_size: Tuple[int, int],
    finest_scale: float = 56.0,
    max_ratio: int = 3,
    tile_hw: Tuple[int, int] = (32, 96),
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
    Th, Tw = tile_hw
    assert Th <= MAX_TH and Tw <= MAX_TW, (Th, Tw)
    assert Th % ROW_BLK == 0 and Tw % COL_BLK == 0, (Th, Tw)
    fdtype = features[0].dtype

    if pyramid is None:
        pyramid = prepare_flat_pyramid(features)
    bufs, sizes, B = pyramid

    n_pad = (-n) % (2 * kroi)
    if n_pad:
        rois = jnp.concatenate([rois, jnp.zeros((n_pad, 5), rois.dtype)], 0)
    m = rois.shape[0]

    tmask, Y, X, r0, c0, nrb, ncb, buf_id = roi_tile_geometry(
        rois, sizes, strides, out_size, finest_scale, max_ratio,
        Th, Tw, fdtype,
    )
    L = len(sizes)

    grid = m // (2 * kroi)
    out = pl.pallas_call(
        functools.partial(
            _kernel, nbufs=2 * L, kroi=kroi, th=Th, tw=Tw
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(grid,),
            in_specs=(
                [pl.BlockSpec(memory_space=pl.ANY)] * (2 * L)
                + [
                    pl.BlockSpec((2 * kroi, oh, Th), lambda i, *_: (i, 0, 0)),
                    pl.BlockSpec((2 * kroi, ow, Tw), lambda i, *_: (i, 0, 0)),
                ]
            ),
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
            # double-buffered (kroi, 32, 96, C) tile scratch wants more
            # than the 16MB default scoped-VMEM budget; v5e has 128MB
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(buf_id, r0, c0, nrb, ncb, *bufs, Y, X)
    # transposed rois come back (ow, oh)-ordered
    # kernels emit (ow, oh, C) raw: transposed RoIs are already
    # (oh, ow), row-major ones swap here — one fused where either way,
    # and the per-RoI swap relayout inside the kernel disappears
    out = jnp.where(
        tmask[:, None, None, None], out, jnp.swapaxes(out, 1, 2)
    )
    return out[:n]
