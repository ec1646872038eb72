"""Band-sweep Pallas RoIAlign: sequential band DMA, zero per-RoI copies.

The per-RoI tile-DMA kernel (roi_align_pallas.py) issues one HBM copy per
RoI. At proposal scale (8k RoIs / 16 MB of tile traffic per grid step)
those copies run concurrently with the per-RoI interp matmuls and the two
starve each other on VMEM bandwidth: measured on v5e, DMA alone 11.4 ms,
matmuls alone 5.2 ms, together 59 ms for 8016 RoIs. This kernel removes
the per-RoI DMA entirely:

* RoIs are bucketed by (pyramid buffer, 32-row band) of their tile's LAST
  row and sorted; each touched band is DMA'd ONCE as a 64-row overlapping
  window (band k holds buffer rows [32k-32, 32k+32), so any tile of
  row-extent <= 32 assigned to band k is fully resident). Total traffic
  is bounded by 2x the pyramid bytes (~large sequential copies at full
  HBM bandwidth) instead of #RoIs x tile bytes.
* per-RoI compute reads a FIXED 32-row window aligned to the tile's last
  row (the interp matrix is shifted to the window origin host-side, so
  rows before the tile get exact 0.0 weights). Branch-free rows are
  load-bearing: with (row x col) tier branches the same math measured
  47.8 ms for 8016 RoIs, column-only tiers 19.0 ms — per-RoI ``pl.when``
  regions serialize far worse than the extra row FLOPs. Columns keep
  their 3 tier branches (32/64/96), which measured faster than the
  branch-free 96-col read.
* blocks of ``kroi`` RoIs are padded so every block lies in one band;
  two band slots alternate (compute band k while band k+1 streams in).

Use when RoI count is large (the auto dispatcher switches at >= 4096) —
the tile kernel's per-RoI DMA wins at small counts where total tile bytes
are far below the pyramid size.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align_pallas import (
    COL_BLK,
    MAX_TH,
    MAX_TW,
    ROW_BLK,
    prepare_flat_pyramid,
    roi_tile_geometry,
)

Array = jnp.ndarray

BAND_STEP = 32          # band granularity (rows); window = 2 * BAND_STEP
BAND_ROWS = 64          # resident rows per band (covers 32-row tiles)


def _band_kernel(
    rw0_ref,             # (m_pad,) i32 — 32-row window origin in its buffer
    c0_ref,              # (m_pad,) i32 — 16-snapped in-row origin
    ncb_ref,             # (m_pad,) i32 — col blocks of 32 touched
    bbuf_ref,            # (nblk,) i32 — band's pyramid buffer id
    bstart_ref,          # (nblk,) i32 — band's first resident row
    bnew_ref,            # (nblk,) i32 — 1 if this block starts a new band
    bslot_ref,           # (nblk,) i32 — which of the 2 band slots
    *refs,
    nbufs: int,
    kroi: int,
    th: int,
    tw: int,
    rp_list: Tuple[int, ...],
):
    """refs = [buf_0..buf_{nbufs-1}, y_ref, x_ref, out_ref, band, sem]."""
    bufs = refs[:nbufs]
    y_ref, x_ref, out_ref, band_ref, sem = refs[nbufs:]
    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    ncq = tw // COL_BLK
    c = band_ref.shape[-1]

    def band_dma(bidx, action):
        """Predicated per buffer id (static (64, rp_b, C) copy shape); the
        wait reconstructs the identical descriptor so the semaphore's
        byte count matches the copy that was issued."""
        bbuf, bstart, slot = bbuf_ref[bidx], bstart_ref[bidx], bslot_ref[bidx]
        for b in range(nbufs):
            @pl.when(bbuf == b)
            def _():
                cp = pltpu.make_async_copy(
                    bufs[b].at[pl.ds(bstart, BAND_ROWS), :, :],
                    band_ref.at[slot, :, : rp_list[b], :],
                    sem.at[slot],
                )
                cp.start() if action == "start" else cp.wait()

    @pl.when(blk == 0)
    def _():
        band_dma(0, "start")

    # first block of a band: wait for its DMA (issued at blk-1 or above)
    @pl.when(bnew_ref[blk] == 1)
    def _():
        band_dma(blk, "wait")

    # prefetch the next band while computing this one
    @pl.when((blk + 1 < nblk) & (bnew_ref[blk + 1] == 1))
    def _():
        band_dma(blk + 1, "start")

    slot = bslot_ref[blk]
    bstart = bstart_ref[blk]
    for r in range(kroi):
        i = blk * kroi + r
        row_off = rw0_ref[i] - bstart
        c0 = pl.multiple_of(c0_ref[i], 16)

        def comp(cb):
            cls = cb * COL_BLK
            tile = band_ref[
                slot, pl.ds(row_off, th), pl.ds(c0, cls), :
            ]                                       # (th, cls, C)
            # contract the ROW dim of the 3D tile directly: reshaping to
            # (th, cls*C) first moves the row dim into sublanes — a full
            # relayout of the tile per RoI
            t1 = jax.lax.dot_general(
                y_ref[r], tile,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (oh, cls, C)
            out = jax.lax.dot_general(
                x_ref[r][:, :cls], t1,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (ow, oh, C)
            out_ref[r] = out.astype(out_ref.dtype)   # (ow, oh, C) raw

        for cb in range(1, ncq + 1):
            @pl.when(ncb_ref[i] == cb)
            def _():
                comp(cb)


def _band_kernel_tiered(
    rw0_ref,             # (m_pad,) i32 — 32-row window origin in its buffer
    c0_ref,              # (m_pad,) i32 — 16-snapped in-row origin
    ncb_ref,             # (nblk,) i32 — BLOCK-uniform col tier (1..ncq)
    bbuf_ref,            # (nblk,) i32 — band's pyramid buffer id
    bstart_ref,          # (nblk,) i32 — band's first resident row
    bnew_ref,            # (nblk,) i32 — 1 if this block starts a new band
    bslot_ref,           # (nblk,) i32 — which of the 2 band slots
    *refs,
    nbufs: int,
    kroi: int,
    th: int,
    tw: int,
    rp_list: Tuple[int, ...],
):
    """Tier-homogeneous variant of _band_kernel.

    The per-RoI kernel predicates the interp matmuls on the RoI's column
    tier — ncq (=3) ``pl.when`` regions per RoI, kroi * ncq per block.
    Mosaic serializes predicated regions, so at proposal scale the branch
    machinery rivals the matmuls themselves. Here RoIs are bucketed by
    (band, tier) host-side (each kroi-block is tier-uniform by
    construction, like the buffer id already was), so the tier branch
    runs ONCE per block and every per-RoI body is branch-free. Costs
    ~(kroi-1)/2 extra padded slots per (band, tier) run vs per-band runs.
    """
    bufs = refs[:nbufs]
    y_ref, x_ref, out_ref, band_ref, sem = refs[nbufs:]
    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    ncq = tw // COL_BLK

    def band_dma(bidx, action):
        bbuf, bstart, slot = bbuf_ref[bidx], bstart_ref[bidx], bslot_ref[bidx]
        for b in range(nbufs):
            @pl.when(bbuf == b)
            def _():
                cp = pltpu.make_async_copy(
                    bufs[b].at[pl.ds(bstart, BAND_ROWS), :, :],
                    band_ref.at[slot, :, : rp_list[b], :],
                    sem.at[slot],
                )
                cp.start() if action == "start" else cp.wait()

    @pl.when(blk == 0)
    def _():
        band_dma(0, "start")

    @pl.when(bnew_ref[blk] == 1)
    def _():
        band_dma(blk, "wait")

    @pl.when((blk + 1 < nblk) & (bnew_ref[blk + 1] == 1))
    def _():
        band_dma(blk + 1, "start")

    slot = bslot_ref[blk]
    bstart = bstart_ref[blk]

    def comp(r, cls):
        i = blk * kroi + r
        row_off = rw0_ref[i] - bstart
        c0 = pl.multiple_of(c0_ref[i], 16)
        tile = band_ref[
            slot, pl.ds(row_off, th), pl.ds(c0, cls), :
        ]                                           # (th, cls, C)
        t1 = jax.lax.dot_general(
            y_ref[r], tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (oh, cls, C)
        out = jax.lax.dot_general(
            x_ref[r][:, :cls], t1,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (ow, oh, C)
        out_ref[r] = out.astype(out_ref.dtype)       # (ow, oh, C) raw

    for cb in range(1, ncq + 1):
        @pl.when(ncb_ref[blk] == cb)
        def _():
            for r in range(kroi):
                comp(r, cb * COL_BLK)


def _band_kernel_matmul(
    c0rel_ref,           # (m_pad,) i32 — in-PANEL origin (16-aligned)
    bbuf_ref,            # (nblk,) i32 — group's pyramid buffer id
    bstart_ref,          # (nblk,) i32 — group band's first resident row
    bpo_ref,             # (nblk,) i32 — group panel's first column
    bnew_ref,            # (nblk,) i32 — 1 if this block starts a new group
    bslot_ref,           # (nblk,) i32 — which of the 2 panel slots
    bact_ref,            # (nblk,) i32 — 0 for trailing all-dummy blocks
    *refs,
    nbufs: int,
    kroi: int,
    th: int,
    tw: int,
    pw: int,
    rp_list: Tuple[int, ...],
):
    """Whole-block stage-1 matmul over (band x column-panel) groups.

    The per-RoI kernel's stage-1 interp matmul runs at M=oh(=7), K=th(=32)
    — ~2% MXU fill — wrapped in per-RoI column-tier branches that Mosaic
    serializes. Here RoIs are grouped host-side by (64-row band, 2*Tw-wide
    column panel); Y is built over the FULL band window (rows outside the
    RoI's tile get exact 0.0 weights), so stage 1 for a whole kroi-block
    is ONE branch-free matmul

        (kroi*oh, 64) @ panel(64, pw, C) -> t1 (kroi*oh, pw, C)

    and stage 2 stays per-RoI but branch-free at the full tile width
    (X's zero columns annihilate unused taps): X (ow, tw) @ t1[r] window
    (oh, tw, C) -> (ow, oh, C). A full-band-width stage 1 (no panels) was
    measured 107 ms vs the per-RoI kernel's 19 ms at 8k RoIs — the widest
    buffer is 640 columns while any RoI touches <= 96, so panels are
    load-bearing, as is the ``bact`` guard (panel grouping multiplies the
    worst-case padded-slot bound; trailing dummy blocks must no-op).

    refs = [buf_0..buf_{nbufs-1}, y_ref, x_ref, out_ref, band, t1, sem].
    """
    bufs = refs[:nbufs]
    y_ref, x_ref, out_ref, band_ref, t1_ref, sem = refs[nbufs:]
    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    oh = out_ref.shape[1]

    def band_dma(bidx, action):
        bbuf, bstart = bbuf_ref[bidx], bstart_ref[bidx]
        po, slot = bpo_ref[bidx], bslot_ref[bidx]
        po = pl.multiple_of(po, 16)
        for b in range(nbufs):
            wb = min(pw, rp_list[b])
            @pl.when(bbuf == b)
            def _():
                cp = pltpu.make_async_copy(
                    bufs[b].at[
                        pl.ds(bstart, BAND_ROWS), pl.ds(po, wb), :
                    ],
                    band_ref.at[slot, :, :wb, :],
                    sem.at[slot],
                )
                cp.start() if action == "start" else cp.wait()

    @pl.when(bact_ref[blk] == 1)
    def _():
        @pl.when(blk == 0)
        def _():
            # stale panel columns beyond a narrow buffer's width feed the
            # branch-free stage 1: uninitialized VMEM may hold inf/NaN
            # bit patterns that would poison t1 under zero X weights
            band_ref[...] = jnp.zeros_like(band_ref)
            band_dma(0, "start")

        @pl.when(bnew_ref[blk] == 1)
        def _():
            band_dma(blk, "wait")

        @pl.when(
            (blk + 1 < nblk) & (bnew_ref[blk + 1] == 1)
            & (bact_ref[blk + 1] == 1)
        )
        def _():
            band_dma(blk + 1, "start")

        slot = bslot_ref[blk]
        t1 = jax.lax.dot_general(
            y_ref[...], band_ref[slot],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # (kroi*oh, pw, C)
        t1_ref[...] = t1.astype(t1_ref.dtype)

        for r in range(kroi):
            c0 = pl.multiple_of(c0rel_ref[blk * kroi + r], 16)
            t1r = t1_ref[pl.ds(r * oh, oh), pl.ds(c0, tw), :]  # (oh,tw,C)
            out = jax.lax.dot_general(
                x_ref[r].astype(t1_ref.dtype), t1r,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (ow, oh, C)
            out_ref[r] = out.astype(out_ref.dtype)   # (ow, oh, C) raw


KPACK = 4               # RoIs K-stacked per interp matmul (4 * 32 = 128)


def _band_kernel_packed(
    rw0_ref,             # (m_pad,) i32 — 32-row window origin in its buffer
    c0_ref,              # (m_pad,) i32 — 16-snapped in-row origin
    ncb_ref,             # (m_pad,) i32 — col blocks of 32 touched
    bbuf_ref,            # (nblk,) i32 — band's pyramid buffer id
    bstart_ref,          # (nblk,) i32 — band's first resident row
    bnew_ref,            # (nblk,) i32 — 1 if this block starts a new band
    bslot_ref,           # (nblk,) i32 — which of the 2 band slots
    *refs,
    nbufs: int,
    kroi: int,
    th: int,
    tw: int,
    rp_list: Tuple[int, ...],
):
    """K-packed variant of _band_kernel — identical band DMA schedule,
    but the per-RoI interp matmuls are batched 4 RoIs at a time.

    The per-RoI stage-1 matmul Y (7, 32) @ tile uses one MXU K-block of
    128 where only 32 rows carry data — 4x wasted MXU blocks. Stacking
    KPACK=4 RoIs' tiles along K (4 * 32 = 128) with a block-diagonal Y
    (28, 128) computes the same products in a quarter of the blocks. The
    zero off-diagonal blocks contribute exact 0.0 terms, so the result
    matches the unpacked kernel to f32 accumulation-order rounding. The
    K-stack is assembled with LAYOUT-PRESERVING 3D block copies (row dim
    stays leading, (col, C) stay (sublane, lane)) and contracted with a
    3D dot_general — reshaping tiles to (rows, cls*C) would relayout
    every tile through the sublanes twice.

    refs = [buf_0..buf_{nbufs-1}, y_ref, x_ref, out_ref,
            band, y4, kstack, sem].
    """
    bufs = refs[:nbufs]
    (y_ref, x_ref, out_ref, band_ref, y4_ref, ks_ref,
     sem) = refs[nbufs:]
    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    ncq = tw // COL_BLK
    c = band_ref.shape[-1]
    oh = y_ref.shape[1]
    ow = x_ref.shape[1]
    P = KPACK

    def band_dma(bidx, action):
        bbuf, bstart, slot = bbuf_ref[bidx], bstart_ref[bidx], bslot_ref[bidx]
        for b in range(nbufs):
            @pl.when(bbuf == b)
            def _():
                cp = pltpu.make_async_copy(
                    bufs[b].at[pl.ds(bstart, BAND_ROWS), :, :],
                    band_ref.at[slot, :, : rp_list[b], :],
                    sem.at[slot],
                )
                cp.start() if action == "start" else cp.wait()

    @pl.when(blk == 0)
    def _():
        band_dma(0, "start")
        # off-diagonal Y4 blocks are never written again: zero once
        y4_ref[...] = jnp.zeros_like(y4_ref)

    @pl.when(bnew_ref[blk] == 1)
    def _():
        band_dma(blk, "wait")

    @pl.when((blk + 1 < nblk) & (bnew_ref[blk + 1] == 1))
    def _():
        band_dma(blk + 1, "start")

    slot = bslot_ref[blk]
    bstart = bstart_ref[blk]
    for h in range(kroi // P):
        base = h * P
        # group tier: widest column tier among the 4 packed RoIs (the
        # in-band sort orders by tier, so mixed groups are rare)
        tier = ncb_ref[blk * kroi + base]
        for i in range(1, P):
            tier = jnp.maximum(tier, ncb_ref[blk * kroi + base + i])

        # block-diagonal Y: static (7, 32) positions, always overwritten
        for i in range(P):
            y4_ref[i * oh:(i + 1) * oh, i * th:(i + 1) * th] = (
                y_ref[base + i]
            )

        def comp(cb):
            cls = cb * COL_BLK
            for i in range(P):
                idx = blk * kroi + base + i
                row_off = rw0_ref[idx] - bstart
                c0 = pl.multiple_of(c0_ref[idx], 16)
                ks_ref[i * th:(i + 1) * th, :cls, :] = band_ref[
                    slot, pl.ds(row_off, th), pl.ds(c0, cls), :
                ]
            t1 = jax.lax.dot_general(
                y4_ref[...], ks_ref[:, :cls, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                       # (P*oh, cls, C)
            for i in range(P):
                out = jax.lax.dot_general(
                    x_ref[base + i][:, :cls], t1[i * oh:(i + 1) * oh],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                   # (ow, oh, C)
                out_ref[base + i] = out.astype(out_ref.dtype)  # raw

        for cb in range(1, ncq + 1):
            @pl.when(tier == cb)
            def _():
                comp(cb)


def multilevel_roi_align_band(
    features: Sequence[Array],   # per level (B, H_l, W_l, C)
    rois: Array,                 # (n, 5)
    strides: Sequence[int],
    out_size: Tuple[int, int],
    finest_scale: float = 56.0,
    max_ratio: int = 3,
    tile_hw: Tuple[int, int] = (32, 96),
    kroi: int = 8,
    pyramid=None,
    packed: bool = False,
    tiered: bool = False,
    matmul: bool = False,
    t1_dtype=None,
) -> Array:
    """Band-sweep RoIAlign; semantics == multilevel_roi_align (gather).

    ``packed`` batches the interp matmuls 4 RoIs at a time along the MXU
    contraction (see _band_kernel_packed); exact up to f32 accumulation
    order. Measured on v5e at 8016 proposal-mix RoIs (batch 8): packed
    19.1 ms vs unpacked 16.4 — the K-stack VMEM copies cost more than
    the saved MXU K-blocks, so the per-RoI kernel stays the default;
    the packed path is kept for future re-evaluation and is covered by
    the same oracle tests.

    ``matmul`` runs stage 1 as one whole-block (kroi*oh, 64) @ panel
    matmul with Y built over the full band window and (band, 2*Tw
    column panel) grouping (see _band_kernel_matmul); ``t1_dtype`` sets
    the stage-1 scratch precision (default f32 — exact). MEASURED SLOWER
    than the per-RoI kernel on v5e at 8016 proposal-mix RoIs: panel
    kroi=8 f32 33.7 ms / kroi=16 f32 41.6 / kroi=8 bf16 45.4 vs 19.15 ms
    per-RoI (and 107 ms for a full-band-width stage 1 without panels;
    kroi=16 without panels OOMs the 128 MB VMEM at wmax=640). MXU time
    here tracks lane passes (N), not M-row fill, so batching RoIs along M
    buys nothing while the full-panel N and the t1 VMEM round trip cost
    ~2.4 ms/GB; the per-RoI kernel's column-tier-shaped matmuls minimize
    N and keep t1 in registers. Kept for oracle-tested re-evaluation on
    future Mosaic versions; default stays the per-RoI kernel.

    ``tiered`` buckets RoIs by (band, column tier) instead of band alone,
    making every kroi-block tier-uniform so the kernel's column-tier
    branch runs once per block instead of once per RoI (see
    _band_kernel_tiered). Exact same outputs (oracle-tested, and
    bitwise-equal to the unpacked kernel on TPU). Measured at 8016
    proposal-mix RoIs (batch 8, v5e): 30.0 ms vs 16-22 unpacked — the
    ~14% extra padded blocks plus ncq kroi-RoI predicated bodies (3x the
    predicated code) outweigh the removed per-RoI branches, so per-RoI
    tier branches stay the default; kept for re-evaluation on future
    Mosaic versions."""
    C = features[0].shape[-1]
    oh, ow = out_size
    assert oh == ow, "dual-orientation tiles require square outputs"
    n = rois.shape[0]
    Th, Tw = tile_hw
    assert Th <= MAX_TH and Tw <= MAX_TW and Th <= BAND_STEP
    if matmul:
        packed = tiered = False
    packed = packed and not tiered and kroi % KPACK == 0  # whole groups
    fdtype = features[0].dtype

    if pyramid is None:
        pyramid = prepare_flat_pyramid(features)
    bufs, sizes, B = pyramid
    nbufs = len(bufs)
    rows_list = [int(b.shape[0]) for b in bufs]
    rp_list = tuple(int(b.shape[1]) for b in bufs)
    assert min(rows_list) >= BAND_ROWS, (
        "band sweep needs >= 64 rows per buffer; use the tile kernel"
    )
    wmax = max(rp_list)

    m = n
    # row_window=True: rw0 is a fixed Th-row read window aligned to the
    # tile's last touched row block (branch-free rows in the kernel), and
    # Y is built directly at the window origin. Window stays inside the
    # 64-row band: rw0 >= bstart and rw0 + Th <= bstart + 64 for
    # bstart = clip(32k - 32, 0, rows - 64), k = (rw0 + Th - 1) // 32.
    geo = roi_tile_geometry(
        rois, sizes, strides, out_size, finest_scale, max_ratio,
        Th, Tw, fdtype, row_window=True, return_axis_data=matmul,
    )
    tmask, Y, X, rw0, c0, nrb, ncb, buf_id = geo[:8]
    end_row = rw0 + Th - 1

    # ---- band assignment --------------------------------------------------
    # band of a tile = band containing its LAST touched row; band k of a
    # buffer holds rows [min(32k - 32, rows - 64) (clipped >= 0), +64)
    kb_counts = [(rows + BAND_STEP - 1) // BAND_STEP for rows in rows_list]
    base = [0]
    for kb in kb_counts:
        base.append(base[-1] + kb)
    n_bands = base[-1]
    base_arr = jnp.asarray(base[:-1], jnp.int32)
    rows_arr = jnp.asarray(rows_list, jnp.int32)

    k_band = end_row // BAND_STEP
    band = base_arr[buf_id] + k_band                      # (m,)

    def band_start_of(band_ids):
        bbuf = (
            jnp.searchsorted(
                jnp.asarray(base[1:], jnp.int32), band_ids, side="right"
            )
        ).astype(jnp.int32)
        kk = band_ids - base_arr[bbuf]
        start = jnp.minimum(
            kk * BAND_STEP - BAND_STEP, rows_arr[bbuf] - BAND_ROWS
        )
        return bbuf, jnp.clip(start, 0, None).astype(jnp.int32)

    if matmul:
        # rebuild Y over the RoI's full 64-row band window (image-relative
        # origin; rows outside the tile get exact 0.0 weights) so stage 1
        # can run as one whole-block matmul against the resident band
        from .roi_align import _axis_interp_matrix

        a_coords, ma1, ga, A_size, batch, im_rows = geo[8]
        _, bstart_roi = band_start_of(band)
        a0_band = (bstart_roi - batch * im_rows).astype(jnp.float32)
        Y = _axis_interp_matrix(
            a_coords, ma1, ga, a0_band, A_size, BAND_ROWS
        ).astype(fdtype)

    # ---- sort by band (or (band, tier)), pad runs to kroi multiples -------
    # everything below is GATHER-only: scattering Y/X into padded slots
    # (.at[slot].set) lowered to TPU scatters that cost ~25 ms/step at 8k
    # RoIs — more than the kernel itself. Instead each padded slot
    # computes which sorted RoI it reads (src_orig) and gathers.
    # packed mode additionally orders by column tier WITHIN each band so
    # the groups of KPACK RoIs are (mostly) tier-homogeneous — a mixed
    # group computes at the widest member's tier. tiered mode buckets by
    # (band, tier) outright so every block is tier-uniform (ncb becomes a
    # per-BLOCK input). The band bookkeeping only depends on band order,
    # which every key here preserves.
    ncq = Tw // COL_BLK
    if matmul:
        # (band, column-panel) grouping: panel p of a buffer holds columns
        # [po, po + pw) with po = clip(Tw * p, 0, rp_b - min(pw, rp_b)) —
        # any RoI window [c0, c0 + Tw) with panel id c0 // Tw fits (the
        # po clamp at the right edge still covers it since c0 + Tw <=
        # rp_b). Buffers narrower than the panel collapse to panel 0.
        pw = min(2 * Tw, wmax)
        rp_arr = jnp.asarray(rp_list, jnp.int32)
        wcap_arr = jnp.minimum(pw, rp_arr)
        P = max(1, (wmax - Tw) // Tw + 1)
        pnl = jnp.where(
            rp_arr[buf_id] <= pw, 0, c0 // Tw
        ).astype(jnp.int32)
        group = band * P + pnl
        n_groups = int(n_bands * P)
        worst_runs = min(n_bands * P, m)
    elif tiered:
        group = band * (ncq + 1) + ncb                    # tier in 1..ncq
        n_groups = int(n_bands * (ncq + 1))
        worst_runs = n_bands * ncq
    else:
        group = band
        n_groups = n_bands
        worst_runs = n_bands
    sort_key = band * 4 + ncb if packed else group
    order = jnp.argsort(sort_key)                         # stable
    group_sorted = group[order]
    # cum_counts[k] = #RoIs in groups < k. A (m, n_groups) compare-sum:
    # jnp.searchsorted lowers to a vectorized binary-search while-loop
    # that profiled 1.5 ms/step at 8k RoIs; a scatter-add histogram is a
    # TPU scatter (worse). The brute compare matrix is ~3M lane ops.
    cum_counts = jnp.sum(
        group[:, None] < jnp.arange(n_groups + 1, dtype=jnp.int32)[None, :],
        axis=0, dtype=jnp.int32,
    )
    counts = cum_counts[1:] - cum_counts[:-1]             # (n_groups,)
    padded = ((counts + kroi - 1) // kroi) * kroi
    cum_padded = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
    )
    # slot of sorted element j: pad_off[group_j] + rank within its group
    rank = jnp.arange(m, dtype=jnp.int32) - cum_counts[group_sorted]
    slot_sorted = cum_padded[group_sorted] + rank         # (m,)

    m_pad = ((m + (kroi - 1) * worst_runs + kroi - 1) // kroi) * kroi
    nblk = m_pad // kroi

    # per-slot group id (compare-sum, not searchsorted — see cum_counts);
    # trailing slots (beyond all real groups) clip to the last group —
    # their RoIs are dummies with zero interp weights
    group_slotted = jnp.clip(
        jnp.sum(
            cum_padded[None, :] <= jnp.arange(m_pad, dtype=jnp.int32)[:, None],
            axis=1, dtype=jnp.int32,
        ) - 1,
        0, n_groups - 1,
    )
    if matmul:
        band_slotted = group_slotted // P
    elif tiered:
        band_slotted = group_slotted // (ncq + 1)
    else:
        band_slotted = group_slotted
    dummy_buf, dummy_start = band_start_of(band_slotted)

    # which original RoI each padded slot reads; dummy slots (rank past
    # their group's real count) clamp to an arbitrary in-group RoI and
    # are masked to zero weights / band-start reads below
    rank_p = jnp.arange(m_pad, dtype=jnp.int32) - cum_padded[group_slotted]
    cnt_p = counts[group_slotted]
    valid_p = rank_p < cnt_p
    src_sorted = cum_counts[group_slotted] + jnp.minimum(
        rank_p, jnp.maximum(cnt_p - 1, 0)
    )
    src_orig = order[jnp.clip(src_sorted, 0, m - 1)]      # (m_pad,)

    def sel(arr, dummy):
        g = arr[src_orig]
        v = valid_p.reshape((m_pad,) + (1,) * (arr.ndim - 1))
        return jnp.where(v, g, jnp.asarray(dummy, arr.dtype))

    rw0_p = jnp.where(valid_p, rw0[src_orig], dummy_start)
    c0_p = sel(c0, 0)
    ncb_p = sel(ncb, 1)
    Y_p = sel(Y, 0)
    X_p = sel(X, 0)

    blk_band = band_slotted[:: kroi]                      # (nblk,)
    blk_buf, blk_start = band_start_of(blk_band)
    blk_key = group_slotted[:: kroi] if matmul else blk_band
    blk_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (blk_key[1:] != blk_key[:-1]).astype(jnp.int32)]
    )
    blk_slot = ((jnp.cumsum(blk_new) - 1) % 2).astype(jnp.int32)
    if tiered:
        # block-uniform column tier (trailing dummy blocks clip to the
        # last group; their slots have zero weights, any tier is safe)
        ncb_p = jnp.maximum(group_slotted[:: kroi] % (ncq + 1), 1)

    if matmul:
        t1dt = t1_dtype or jnp.float32
        # panel column origin per block (16-aligned: Tw*p and rp - wcap
        # are both multiples of 16 — prepare_flat_pyramid rounds rp up)
        blk_pnl = (group_slotted[:: kroi] % P).astype(jnp.int32)
        blk_po = jnp.clip(
            jnp.minimum(
                Tw * blk_pnl, rp_arr[blk_buf] - wcap_arr[blk_buf]
            ),
            0, None,
        ).astype(jnp.int32)
        # in-panel window origin per slot; dummy slots clamp to 0 (their
        # X weights are zero, any in-bounds read is fine)
        po_slot = jnp.repeat(blk_po, kroi)
        c0rel_p = jnp.clip(c0_p - po_slot, 0, None).astype(jnp.int32)
        # trailing blocks past the real padded extent are all-dummy; the
        # kernel skips them entirely (worst_runs * (kroi-1) bounds the
        # static grid far above the actual padded slot count)
        blk_act = (
            jnp.arange(nblk, dtype=jnp.int32) * kroi < cum_padded[-1]
        ).astype(jnp.int32)
        # (m_pad, oh, 64) -> (m_pad*oh, 64): the kernel's y block is the
        # whole block's Y stacked along M, and merging the leading dims
        # host-side keeps the in-kernel access a plain block slice
        y_flat = Y_p.reshape(m_pad * oh, BAND_ROWS)
        out = pl.pallas_call(
            functools.partial(
                _band_kernel_matmul, nbufs=nbufs, kroi=kroi, th=Th, tw=Tw,
                pw=pw, rp_list=rp_list,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=7,
                grid=(nblk,),
                in_specs=(
                    [pl.BlockSpec(memory_space=pl.ANY)] * nbufs
                    + [
                        pl.BlockSpec(
                            (kroi * oh, BAND_ROWS), lambda i, *_: (i, 0)
                        ),
                        pl.BlockSpec((kroi, ow, Tw), lambda i, *_: (i, 0, 0)),
                    ]
                ),
                out_specs=pl.BlockSpec(
                    (kroi, oh, ow, C), lambda i, *_: (i, 0, 0, 0)
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, BAND_ROWS, pw, C), fdtype),
                    pltpu.VMEM((kroi * oh, pw, C), t1dt),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((m_pad, oh, ow, C), fdtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(c0rel_p, blk_buf, blk_start, blk_po, blk_new, blk_slot, blk_act,
          *bufs, y_flat, X_p)
        # restore original RoI order + orientation (shared epilogue)
        slot_of_orig = slot_sorted[jnp.argsort(order)]
        out = out[slot_of_orig]
        out = jnp.where(
            tmask[:, None, None, None], out, jnp.swapaxes(out, 1, 2)
        )
        return out[:n]

    if tiered:
        kernel = _band_kernel_tiered
        scratch = [
            pltpu.VMEM((2, BAND_ROWS, wmax, C), fdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    elif packed:
        kernel = _band_kernel_packed
        scratch = [
            pltpu.VMEM((2, BAND_ROWS, wmax, C), fdtype),
            pltpu.VMEM((KPACK * oh, KPACK * Th), fdtype),   # Y block-diag
            pltpu.VMEM((KPACK * Th, Tw, C), fdtype),        # tile K-stack
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kernel = _band_kernel
        scratch = [
            pltpu.VMEM((2, BAND_ROWS, wmax, C), fdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        functools.partial(
            kernel, nbufs=nbufs, kroi=kroi, th=Th, tw=Tw,
            rp_list=rp_list,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(nblk,),
            in_specs=(
                [pl.BlockSpec(memory_space=pl.ANY)] * nbufs
                + [
                    pl.BlockSpec((kroi, oh, Th), lambda i, *_: (i, 0, 0)),
                    pl.BlockSpec((kroi, ow, Tw), lambda i, *_: (i, 0, 0)),
                ]
            ),
            out_specs=pl.BlockSpec(
                (kroi, oh, ow, C), lambda i, *_: (i, 0, 0, 0)
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, oh, ow, C), fdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(rw0_p, c0_p, ncb_p, blk_buf, blk_start, blk_new, blk_slot,
      *bufs, Y_p, X_p)

    # restore original RoI order, then fix transposed orientations
    # (argsort(order) inverts the permutation without a TPU scatter)
    slot_of_orig = slot_sorted[jnp.argsort(order)]
    out = out[slot_of_orig]
    # kernels emit (ow, oh, C) raw: transposed RoIs are already
    # (oh, ow), row-major ones swap here — one fused where either way,
    # and the per-RoI swap relayout inside the kernel disappears
    out = jnp.where(
        tmask[:, None, None, None], out, jnp.swapaxes(out, 1, 2)
    )
    return out[:n]
