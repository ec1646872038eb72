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


def _serving_avals(cfg, abstract_vars):
    """Canonical serving-side variable avals: plain nested dicts with the
    params subtree precast exactly like apis.inference._precast_kernels
    (>=2-D float32 leaves -> compute dtype). Matching these avals is what
    lets the executables compiled here be CALLED directly by the serving
    path (split mode) instead of merely pre-warming the compile cache."""
    import flax

    avars = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        flax.core.unfreeze(abstract_vars),
    )
    if cfg.compute_dtype != "bfloat16":
        return avars

    def cast(x):
        if len(x.shape) >= 2 and x.dtype == jnp.float32:
            return jax.ShapeDtypeStruct(x.shape, jnp.bfloat16)
        return x

    avars = dict(avars)
    avars["params"] = jax.tree_util.tree_map(cast, avars["params"])
    return avars


def warm_start(
    cfg,
    model,
    batch: int,
    abstract_vars=None,
    pieces: Sequence[str] = (
        "band", "sorted7", "sorted14", "backbone", "heads",
    ),
    verbose: bool = False,
    return_programs: bool = False,
    raw: bool = False,
):
    """Concurrently AOT-compile the serving program's heavy pieces.

    Returns {piece: seconds}, or ({piece: seconds}, {piece: Compiled})
    with ``return_programs=True``. The backbone/heads executables are
    lowered at the exact serving avals (plain-dict variable tree, params
    precast to the compute dtype), so split-mode serving can call them
    directly: ``feats = progs["backbone"](variables, images)`` then
    ``progs["heads"](variables, feats, cam, shapes, key)``.

    ``abstract_vars`` (from a prior ``jax.eval_shape`` of ``model.init``)
    avoids re-tracing; pass the real variables tree equally — only avals
    are used.

    ``raw=True`` compiles the uint8-canvas serving program: the backbone
    piece becomes ``extract_feats_raw`` (on-device preprocessing fused in
    front, taking (B, raw_height, raw_width, 3) uint8 + native (h, w)),
    and the carry glue runs on the uint8 canvas.
    """
    from ..models.detector import _align_strides

    h, w = cfg.data.pad_height, cfg.data.pad_width
    B = batch
    if abstract_vars is None:
        abstract_vars = _abstract_variables(model, (h, w))
    avars = _serving_avals(cfg, abstract_vars)

    img_sds = jax.ShapeDtypeStruct((B, h, w, 3), jnp.float32)
    raw_sds = jax.ShapeDtypeStruct(
        (B, cfg.data.raw_height, cfg.data.raw_width, 3), jnp.uint8
    )
    shp_sds = jax.ShapeDtypeStruct((B, 2), jnp.float32)
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
        if raw:
            def f(v, x, shp):
                return model.apply(
                    v, x, shp, method=model.extract_feats_raw
                )

            return f, (avars, raw_sds, shp_sds)

        def f(v, x):
            return model.apply(v, x, method=model.extract_feats)

        return f, (avars, img_sds)

    def _heads_fn():
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

    # tiny glue program for split-mode benchmarking (bench.py): a
    # carry-dependent input touch — compiling even a trivial program
    # costs seconds through the remote tunnel, so it is warmed with
    # everything else. (The output-checksum glue is compiled inside the
    # heads piece below, from the heads lowering's out_info — re-tracing
    # heads_forward just for its output avals would double the heaviest
    # host-side tracing work.)
    def _carry_in():
        if raw:
            return (lambda img, c: img + (c * 0.0).astype(img.dtype)), (
                raw_sds, jax.ShapeDtypeStruct((), jnp.float32),
            )
        return (lambda img, c: img + c * 0.0), (
            img_sds, jax.ShapeDtypeStruct((), jnp.float32),
        )

    builders = {
        "band": lambda: _align_micro(
            n_prop, bbox_strides, (7, 7), cfg.bbox_head.finest_scale,
            cfg.bbox_head.align_max_ratio, 24, n_lv,
        ),
        "sorted7": lambda: _align_micro(
            n_det, bbox_strides, (7, 7), cfg.bbox_head.finest_scale,
            cfg.bbox_head.align_max_ratio, 24, n_lv,
        ),
        "sorted14": lambda: _align_micro(
            n_det, noc_strides,
            (cfg.noc_head.roi_size, cfg.noc_head.roi_size),
            cfg.noc_head.finest_scale, cfg.noc_head.align_max_ratio, 32,
            n_lv_noc,
        ),
        "backbone": _backbone,
        "heads": _heads_fn,
        "carry_in": _carry_in,
    }

    extras = {}

    # NOTE: an execution warm-up (running the compiled pieces once on
    # zero inputs inside these threads) was tried and REVERTED: zero
    # inputs drive degenerate data through the NMS/PnP iteration
    # structure (measured 388 s first-batch vs 54 s without), and
    # block_until_ready does not actually wait through the remote
    # tunnel, so the pathological run queued ahead of the first real
    # batch. The first real batch pays executable upload once (~54 s
    # cold); that cost is part of any honest cold number.
    def compile_piece(name):
        t0 = time.time()
        fn, args = builders[name]()
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        if name == "heads" and "checksum" in pieces:
            tc0 = time.time()
            extras["checksum"] = jax.jit(
                lambda d: jnp.sum(d.bboxes_3d).astype(jnp.float32)
            ).lower(lowered.out_info).compile()
            times["checksum"] = time.time() - tc0
        dt = time.time() - t0
        if verbose:
            print(f"[warm_start] {name}: {dt:.1f}s", flush=True)
        return name, dt, compiled

    times = {}
    unknown = [p for p in pieces if p != "checksum" and p not in builders]
    if unknown:
        raise ValueError(f"unknown warm-start pieces: {unknown}")
    if "checksum" in pieces and "heads" not in pieces:
        # the checksum glue is compiled from the heads lowering's out_info
        # (see compile_piece); without "heads" it would silently not exist
        raise ValueError("piece 'checksum' requires piece 'heads'")
    run = [p for p in pieces if p != "checksum"]
    if not run:
        return ({}, {}) if return_programs else {}
    with _fut.ThreadPoolExecutor(max_workers=len(run)) as ex:
        results = list(ex.map(compile_piece, run))
    times.update({name: dt for name, dt, _ in results})
    if return_programs:
        progs = {name: c for name, dt, c in results}
        progs.update(extras)
        return times, progs
    return times
