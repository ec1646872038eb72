"""Sorted per-RoI-DMA Pallas RoIAlign for small/medium RoI counts.

The original tile kernel (roi_align_pallas.py) predicates every per-RoI
copy on (buffer id) x (row tier) x (col tier) — 10 x 6 `pl.when` regions
per RoI for issue plus the same again for wait. Mosaic serializes
predicated regions, and at 800 RoIs the branch overhead alone measured
~10 us/RoI (8.4 ms for a 7x7 / 800-RoI call whose DMA+matmul floor is
under 2 ms). This kernel removes nearly all predication:

* RoIs are SORTED by pyramid buffer id and padded so each block of
  ``kroi`` RoIs reads from a single buffer — the buffer branch runs once
  per block, not once per RoI (same gather-only prep as the band
  kernel's, shared via _sorted_block_prep).
* each RoI issues exactly ONE unconditional (Th, Tw) copy from a fixed
  end-aligned Th-row window (roi_tile_geometry(row_window=True) builds
  the row interp matrix at the window origin, so leading rows are
  zero-weighted) at a 16-snapped column origin. No tier branches: at
  <= ~4k RoIs the extra fetched bytes (<= n x 1.6 MB) are cheaper than
  the serialized branches.
* compute keeps the 3 column-tier branches (32/64/96), which measured
  faster than both the full 96-col matmul and row x col tiering in the
  band-kernel experiments.

Blocks are double-buffered (issue block k+1's copies while computing
block k). The band kernel (roi_align_band.py) stays ahead at proposal
scale (>= 4096 RoIs) where per-RoI fetch bytes exceed pyramid bytes.
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


def sorted_block_prep(key: Array, n_keys: int, kroi: int):
    """Sort m items by integer key, pad each key's run to a kroi multiple.

    Returns (slot_of_orig, src_orig, valid_p, blk_key, m_pad) where
    ``src_orig[j]`` is the original item each padded slot j reads (dummy
    slots clamp to an in-run item and are masked by ``valid_p``),
    ``slot_of_orig`` restores original order from slot order, and
    ``blk_key[b]`` is the shared key of block b. Gather-only: scattering
    into slots measured ~25 ms/step at 8k items on TPU.
    """
    m = key.shape[0]
    order = jnp.argsort(key)
    key_sorted = key[order]
    # compare-sum, not searchsorted: the vectorized binary-search
    # while-loop profiled ~0.8 ms/step at 8k items, the compare matrix
    # is a handful of lane ops
    cum_counts = jnp.sum(
        key[:, None] < jnp.arange(n_keys + 1, dtype=jnp.int32)[None, :],
        axis=0, dtype=jnp.int32,
    )
    counts = cum_counts[1:] - cum_counts[:-1]
    padded = ((counts + kroi - 1) // kroi) * kroi
    cum_padded = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)]
    )
    rank = jnp.arange(m, dtype=jnp.int32) - cum_counts[key_sorted]
    slot_sorted = cum_padded[key_sorted] + rank
    slot_of_orig = slot_sorted[jnp.argsort(order)]

    m_pad = ((m + (kroi - 1) * n_keys + kroi - 1) // kroi) * kroi
    key_slotted = jnp.clip(
        jnp.sum(
            cum_padded[None, :] <= jnp.arange(m_pad, dtype=jnp.int32)[:, None],
            axis=1, dtype=jnp.int32,
        ) - 1,
        0, n_keys - 1,
    )
    rank_p = jnp.arange(m_pad, dtype=jnp.int32) - cum_padded[key_slotted]
    cnt_p = counts[key_slotted]
    valid_p = rank_p < cnt_p
    src_sorted = cum_counts[key_slotted] + jnp.minimum(
        rank_p, jnp.maximum(cnt_p - 1, 0)
    )
    src_orig = order[jnp.clip(src_sorted, 0, m - 1)]
    blk_key = key_slotted[::kroi]
    return slot_of_orig, src_orig, valid_p, blk_key, m_pad


def _sorted_kernel(
    rw0_ref,             # (m_pad,) i32 — Th-row window origin in its buffer
    c0_ref,              # (m_pad,) i32 — 16-snapped in-row origin
    ncb_ref,             # (m_pad,) i32 — col blocks of 32 touched
    bbuf_ref,            # (nblk,) i32 — block's pyramid buffer id
    *refs,
    nbufs: int,
    kroi: int,
    th: int,
    tw: int,
):
    """refs = [buf_0..buf_{nbufs-1}, y_ref, x_ref, out_ref, tiles, sem]."""
    bufs = refs[:nbufs]
    y_ref, x_ref, out_ref, tile_ref, sem = refs[nbufs:]
    blk = pl.program_id(0)
    nblk = pl.num_programs(0)
    ncq = tw // COL_BLK
    c = tile_ref.shape[-1]

    def issue(bidx, slot, action):
        # ONE buffer branch per block; inside it, kroi unconditional
        # fixed-shape copies at dynamic origins
        for b in range(nbufs):
            @pl.when(bbuf_ref[bidx] == b)
            def _():
                for r in range(kroi):
                    i = bidx * kroi + r
                    cp = pltpu.make_async_copy(
                        bufs[b].at[
                            pl.ds(rw0_ref[i], th),
                            pl.ds(pl.multiple_of(c0_ref[i], 16), tw),
                            :,
                        ],
                        tile_ref.at[slot, r],
                        sem.at[slot, r],
                    )
                    cp.start() if action == "start" else cp.wait()

    @pl.when(blk == 0)
    def _():
        issue(0, 0, "start")

    slot = jax.lax.rem(blk, 2)
    issue(blk, slot, "wait")

    @pl.when(blk + 1 < nblk)
    def _():
        issue(blk + 1, 1 - slot, "start")

    for r in range(kroi):
        i = blk * kroi + r

        def comp(cb):
            cls = cb * COL_BLK
            # 3D dot_general on the raw tile — the (th, cls*C) reshape is
            # a sublane relayout (band kernel A/B: 19.4 -> 16.4 ms)
            t1 = jax.lax.dot_general(
                y_ref[r], tile_ref[slot, r, :, :cls, :],
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


def multilevel_roi_align_sorted(
    features: Sequence[Array],   # per level (B, H_l, W_l, C)
    rois: Array,                 # (n, 5)
    strides: Sequence[int],
    out_size: Tuple[int, int],
    finest_scale: float = 56.0,
    max_ratio: int = 3,
    tile_hw: Tuple[int, int] = (32, 96),
    kroi: int = 8,
    pyramid=None,
) -> Array:
    """Sorted-by-buffer RoIAlign; semantics == multilevel_roi_align."""
    C = features[0].shape[-1]
    oh, ow = out_size
    assert oh == ow, "dual-orientation tiles require square outputs"
    n = rois.shape[0]
    Th, Tw = tile_hw
    assert Th <= MAX_TH and Tw <= MAX_TW
    fdtype = features[0].dtype

    if pyramid is None:
        pyramid = prepare_flat_pyramid(features)
    bufs, sizes, B = pyramid
    nbufs = len(bufs)

    tmask, Y, X, rw0, c0, nrb, ncb, buf_id = roi_tile_geometry(
        rois, sizes, strides, out_size, finest_scale, max_ratio,
        Th, Tw, fdtype, row_window=True,
    )

    slot_of_orig, src_orig, valid_p, blk_buf, m_pad = sorted_block_prep(
        buf_id, nbufs, kroi
    )
    nblk = m_pad // kroi

    def sel(arr, dummy):
        g = arr[src_orig]
        v = valid_p.reshape((m_pad,) + (1,) * (arr.ndim - 1))
        return jnp.where(v, g, jnp.asarray(dummy, arr.dtype))

    # dummy slots read buffer rows [0, Th) x cols [0, Tw) — every buffer
    # has >= MAX_TH rows and >= Tw padded columns — with zero weights
    rw0_p = sel(rw0, 0)
    c0_p = sel(c0, 0)
    ncb_p = sel(ncb, 1)
    Y_p = sel(Y, 0)
    X_p = sel(X, 0)

    out = pl.pallas_call(
        functools.partial(
            _sorted_kernel, nbufs=nbufs, kroi=kroi, th=Th, tw=Tw
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
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
            scratch_shapes=[
                pltpu.VMEM((2, kroi, Th, Tw, C), fdtype),
                pltpu.SemaphoreType.DMA((2, kroi)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, oh, ow, C), fdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # kroi=16 bf16 double-buffered tiles = 50 MB scratch alone
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(rw0_p, c0_p, ncb_p, blk_buf, *bufs, Y_p, X_p)

    out = out[slot_of_orig]
    # kernels emit (ow, oh, C) raw: transposed RoIs are already
    # (oh, ow), row-major ones swap here — one fused where either way,
    # and the per-RoI swap relayout inside the kernel disappears
    out = jnp.where(
        tmask[:, None, None, None], out, jnp.swapaxes(out, 1, 2)
    )
    return out[:n]
