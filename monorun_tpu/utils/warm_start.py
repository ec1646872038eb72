"""Parallel cold-start warm-up for the serving program.

A fresh environment pays the whole serving-program compile on the first
batch: XLA body + three Mosaic (Pallas) align kernels, compiled
SEQUENTIALLY inside one monolithic jit — measured 625-869 s through the
remote-TPU tunnel (BENCH_r03.json; tools/cold_profile.py). The compile
service accepts concurrent requests (two ~14 s programs compile in ~max
rather than ~sum, and four align/backbone pieces overlapped to a 50 s
wall with a 119 s sum), and sub-compiles warmed by one program are
reused by later programs in the same process/session (after a full-init
warm-up, the serving fori_loop program compiled in 64 s vs 625+ cold).

This module exploits both: it AOT-compiles the expensive pieces of the
serving program CONCURRENTLY —

* the backbone+neck program (``extract_feats``),
* the three Pallas align kernels as micro-programs at exactly the
  serving geometry (proposal-scale band sweep, detection-scale sorted
  7x7 and 14x14),
* the post-backbone program (``heads_forward``: RPN, NMS, heads, PnP),

— so the caller's subsequent full-program jit assembles from warm
pieces. All pieces are compiled from ABSTRACT inputs (avals only), so
the warm-up needs no real variables and can itself overlap the
parameter build (models/detector.py:_fast_init_variables).

Reference anchor: the pipeline being warmed is the reference's
`monorun_roi_head.py:simple_test` path; the reference (torch eager +
CUDA) has no compile step and pays none of this.
"""

from __future__ import annotations

import concurrent.futures as _fut
import time
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _abstract_variables(model, image_shape):
    h, w = image_shape
    return jax.eval_shape(
        model.init,
        {"params": jax.random.PRNGKey(0)},
        jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 3, 3), jnp.float32),
        jax.ShapeDtypeStruct((1, 2), jnp.float32),
        jax.random.PRNGKey(0),
    )


def warm_start(
    cfg,
    model,
    batch: int,
    abstract_vars=None,
    pieces: Sequence[str] = (
        "band", "sorted7", "sorted14", "backbone", "heads",
    ),
    verbose: bool = False,
) -> Dict[str, float]:
    """Concurrently AOT-compile the serving program's heavy pieces.

    Returns {piece: seconds}. ``abstract_vars`` (from a prior
    ``jax.eval_shape`` of ``model.init``) avoids re-tracing; pass the
    real variables tree equally — only avals are used.
    """
    from ..models.detector import _align_strides

    h, w = cfg.data.pad_height, cfg.data.pad_width
    B = batch
    if abstract_vars is None:
        abstract_vars = _abstract_variables(model, (h, w))
    avars = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), abstract_vars
    )

    img_sds = jax.ShapeDtypeStruct((B, h, w, 3), jnp.float32)
    feats_sds = jax.eval_shape(
        lambda v, x: model.apply(v, x, method=model.extract_feats),
        avars, img_sds,
    )
    feats_sds = tuple(
        jax.ShapeDtypeStruct(f.shape, f.dtype) for f in feats_sds
    )

    tc = cfg.test
    n_prop = B * tc.rpn_nms_post
    K = tc.head_slots if 0 < tc.head_slots < tc.max_per_img \
        else tc.max_per_img
    n_det = B * K
    bbox_strides = _align_strides(cfg, cfg.bbox_head.featmap_strides)
    noc_strides = _align_strides(cfg, cfg.noc_head.featmap_strides)
    n_lv = len(cfg.bbox_head.featmap_strides)
    n_lv_noc = len(cfg.noc_head.featmap_strides)

    def _align_micro(n_rois, strides, out_size, finest, max_ratio, tile_h,
                     n_levels):
        # mirrors the detector's align call sites exactly (same dispatch,
        # same tile/kroi parameters) so the Mosaic kernel content matches
        from ..ops.roi_align import multilevel_roi_align_auto

        def f(*feats):
            rois = jnp.zeros((n_rois, 5), jnp.float32)
            rois = rois.at[:, 3:].set(20.0)
            return multilevel_roi_align_auto(
                list(feats), rois, strides, out_size, finest,
                max_ratio=max_ratio, tile_h=tile_h, pyramid=None,
            )

        return f, feats_sds[:n_levels]

    def _backbone():
        def f(v, x):
            return model.apply(v, x, method=model.extract_feats)

        return f, (avars, img_sds)

    def _heads():
        def f(v, feats, cam, shp, rng):
            return model.apply(
                v, feats, cam, shp, rng, pad_shape=(h, w),
                method=model.heads_forward,
            )

        return f, (
            avars, feats_sds,
            jax.ShapeDtypeStruct((B, 3, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, 2), jnp.float32),
            jax.random.PRNGKey(0),
        )

    builders = {
        "band": lambda: _align_micro(
            n_prop, bbox_strides, (7, 7), cfg.bbox_head.finest_scale,
            3, 24, n_lv,
        ),
        "sorted7": lambda: _align_micro(
            n_det, bbox_strides, (7, 7), cfg.bbox_head.finest_scale,
            3, 24, n_lv,
        ),
        "sorted14": lambda: _align_micro(
            n_det, noc_strides,
            (cfg.noc_head.roi_size, cfg.noc_head.roi_size),
            cfg.noc_head.finest_scale, 2, 32, n_lv_noc,
        ),
        "backbone": _backbone,
        "heads": _heads,
    }

    def compile_piece(name):
        t0 = time.time()
        fn, args = builders[name]()
        jax.jit(fn).lower(*args).compile()
        dt = time.time() - t0
        if verbose:
            print(f"[warm_start] {name}: {dt:.1f}s", flush=True)
        return name, dt

    with _fut.ThreadPoolExecutor(max_workers=len(pieces)) as ex:
        times = dict(ex.map(compile_piece, pieces))
    return times
