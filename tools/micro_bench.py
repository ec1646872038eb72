"""Op-level TPU micro-benchmarks for the inference hot path.

Times individual ops in isolation with the same on-device fori_loop
methodology as bench.py (slope between two trip counts). Usage:
    python tools/micro_bench.py [batch] [op ...]
Ops: pyramid align7k align7 align14 global noc carafe pnp proposals
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
OPS = sys.argv[2:] or [
    "pyramid", "align7k", "align7", "align14", "global", "noc",
    "carafe", "pnp", "proposals",
]
N_SHORT, N_LONG = 8, 32


def timeit(name, fn, *args):
    """fn must return an array; times n reps via fori_loop slope.

    The loop body perturbs the first (float) argument by carry * 0 so each
    iteration depends on the previous one — without it XLA hoists the
    loop-invariant call out of the fori_loop entirely.
    """
    def run_n(n, *a):
        def body(i, carry):
            # carry * tiny is a runtime value XLA cannot fold away (x * 0.0
            # DOES get simplified to 0, which hoists fn out of the loop)
            a0 = a[0] + (carry * 1e-30).astype(a[0].dtype)
            out = fn(a0, *a[1:])
            return jnp.sum(out).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jfn = jax.jit(run_n, static_argnums=())
    # host fetch, not block_until_ready: through the axon tunnel
    # block_until_ready returns without waiting for device completion,
    # which reads every op as ~0 ms; only a value fetch synchronizes
    float(jfn(1, *args))

    def t(n):
        t0 = time.time()
        float(jfn(n, *args))
        return time.time() - t0

    t(N_SHORT)
    ts = min(t(N_SHORT), t(N_SHORT))
    tl = min(t(N_LONG), t(N_LONG))
    ms = (tl - ts) / (N_LONG - N_SHORT) * 1e3
    print(f"{name:>14s}: {ms:8.3f} ms/call", flush=True)
    return ms


def main():
    B = BATCH
    h, w = 384, 1280
    C = 256
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    strides = (2, 4, 8, 16, 32)
    # generate the pyramid ON DEVICE: uploading ~85 MB/level*levels of
    # host arrays through the remote tunnel dominates the whole run
    feats = [
        jax.random.normal(
            jax.random.PRNGKey(i), (B, h // s, w // s, C), jnp.float32
        ).astype(dt)
        for i, s in enumerate(strides)
    ]

    def mk_rois(n_per_img, small_bias=True):
        """KITTI-ish RoI mix: mostly small boxes, a few large."""
        n = B * n_per_img
        # log-uniform scale 16..512 px, aspect 0.4..2.5
        sc = np.exp(rng.uniform(np.log(16), np.log(420), n))
        ar = np.exp(rng.uniform(np.log(0.4), np.log(2.5), n))
        bw = sc * np.sqrt(ar)
        bh = sc / np.sqrt(ar)
        cx = rng.uniform(0, 1242, n)
        cy = rng.uniform(0, 375, n)
        x1 = np.clip(cx - bw / 2, 0, 1279)
        y1 = np.clip(cy - bh / 2, 0, 383)
        x2 = np.clip(cx + bw / 2, 1, 1280)
        y2 = np.clip(cy + bh / 2, 1, 384)
        bi = np.repeat(np.arange(B), n_per_img)
        return jnp.asarray(
            np.stack([bi, x1, y1, x2, y2], 1).astype(np.float32)
        )

    rois7k = mk_rois(1000)
    rois100 = mk_rois(100)
    rois48 = mk_rois(48)      # serving head_slots count

    from monorun_tpu.ops.roi_align import (
        multilevel_roi_align_auto, prepare_pyramid,
    )

    if "pyramid" in OPS:
        timeit(
            "pyramid",
            lambda *fs: prepare_pyramid(fs)[0][0],
            *feats,
        )

    pyr = None  # build inside the timed fn? no — share like detector does

    def align(rois, size, mr, th, fs, impl=None):
        def f(*a):
            import os as _os

            fl = a[: len(fs)]
            r = a[len(fs)]
            pyr = prepare_pyramid(fl)
            prev = _os.environ.get("MONORUN_ALIGN_IMPL")
            if impl is not None:
                _os.environ["MONORUN_ALIGN_IMPL"] = impl
            try:
                return multilevel_roi_align_auto(
                    fl, r, strides[: len(fs)], size,
                    20.0 if size == (7, 7) else 28.0,
                    max_ratio=mr, tile_h=th, pyramid=pyr,
                )
            finally:
                if impl is not None:
                    if prev is None:
                        _os.environ.pop("MONORUN_ALIGN_IMPL", None)
                    else:
                        _os.environ["MONORUN_ALIGN_IMPL"] = prev
        return f

    if "align7k" in OPS:
        timeit(
            "align7k+pyr", align(rois7k, (7, 7), 3, 24, feats),
            *feats, rois7k,
        )
    if "align7" in OPS:
        timeit(
            "align7_100+pyr", align(rois100, (7, 7), 3, 24, feats),
            *feats, rois100,
        )
    if "align14" in OPS:
        timeit(
            "align14_100", align(rois100, (14, 14), 2, 32, feats),
            *feats, rois100,
        )
    # detection-scale A/B at the serving head_slots count (48/img):
    # sorted Pallas kernel vs XLA gather lowering
    if "align48" in OPS:
        for impl in ("sorted", "gather"):
            timeit(
                f"align7_48[{impl}]",
                align(rois48, (7, 7), 3, 24, feats, impl=impl),
                *feats, rois48,
            )
            timeit(
                f"align14_48[{impl}]",
                align(rois48, (14, 14), 2, 32, feats, impl=impl),
                *feats, rois48,
            )

    n_det = B * 100
    if "global" in OPS:
        from monorun_tpu.config import get_config
        from monorun_tpu.models.global_head import GlobalHead

        cfg = get_config("kitti_multiclass")
        gh = GlobalHead(cfg.global_head, dtype=dt)
        x7 = jax.random.normal(
            jax.random.PRNGKey(10), (n_det, 7, 7, C), jnp.float32
        ).astype(dt)
        gv = gh.init(jax.random.PRNGKey(0), x7, False, jax.random.PRNGKey(1))
        timeit(
            "global_mc",
            lambda xx: gh.apply(
                gv, xx, False, jax.random.PRNGKey(1)
            ).dim_latent_pred,
            x7,
        )

    if "noc" in OPS:
        from monorun_tpu.config import get_config
        from monorun_tpu.models.noc_head import NOCHead

        cfg = get_config("kitti_multiclass")
        nh = NOCHead(cfg.noc_head, dtype=dt)
        x14 = jax.random.normal(
            jax.random.PRNGKey(11), (n_det, 14, 14, C), jnp.float32
        ).astype(dt)
        lat = jax.random.normal(
            jax.random.PRNGKey(12), (n_det, 16), jnp.float32
        ).astype(dt)
        lbl = jnp.asarray(rng.integers(0, 3, n_det), jnp.int32)
        flp = jnp.zeros((n_det,), bool)
        nv = nh.init(jax.random.PRNGKey(0), x14, lat, lbl, flp, False)
        timeit(
            "noc_head",
            lambda xx: nh.apply(nv, xx, lat, lbl, flp, False).noc_pred,
            x14,
        )

    if "carafe" in OPS:
        from monorun_tpu.config import get_config
        from monorun_tpu.ops.carafe import CARAFEPack

        cfg = get_config("kitti_multiclass")
        cp = CARAFEPack(channels=C, dtype=dt)
        x14 = jax.random.normal(
            jax.random.PRNGKey(13), (n_det, 14, 14, C), jnp.float32
        ).astype(dt)
        cv = cp.init(jax.random.PRNGKey(0), x14)
        timeit("carafe", lambda xx: cp.apply(cv, xx), x14)

    if "pnp" in OPS:
        from monorun_tpu.ops.pnp import PnPConfig, pnp_uncert

        n_pts = 784
        c2d = jax.random.uniform(
            jax.random.PRNGKey(14), (n_det, n_pts, 2), jnp.float32, 0, 1000
        )
        istd = jax.random.uniform(
            jax.random.PRNGKey(15), (n_det, n_pts, 2), jnp.float32, 0.5, 2
        )
        c3d = jax.random.normal(
            jax.random.PRNGKey(16), (n_det, n_pts, 3), jnp.float32
        )
        cams = jnp.tile(
            jnp.asarray(
                [[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1]],
                jnp.float32,
            ),
            (n_det, 1, 1),
        )
        ur = jnp.tile(jnp.asarray([[-200.0, 1442.0]]), (n_det, 1))
        vr = jnp.tile(jnp.asarray([[-200.0, 575.0]]), (n_det, 1))
        thr = jnp.full((n_det,), 20.0)

        def pnp_fn(a, b, c):
            r = pnp_uncert(
                a, b, c, cams, ur, vr, ransac_thr=thr,
                rng=jax.random.PRNGKey(0), cfg=PnPConfig(),
            )
            return r.t_vec
        timeit("pnp", pnp_fn, c2d, istd, c3d)

    if "proposals" in OPS:
        from monorun_tpu.config import get_config
        from monorun_tpu.models.rpn import RPNHead, get_proposals

        cfg = get_config("kitti_multiclass")
        n_anchors = len(cfg.rpn.anchors.scales) * len(cfg.rpn.anchors.ratios)
        rh = RPNHead(feat_channels=256, num_anchors=n_anchors, dtype=dt)
        rpn_feats = feats[1:] + [feats[-1][:, ::2, ::2]]
        rv = rh.init(jax.random.PRNGKey(0), rpn_feats)

        def prop_fn(*fs):
            cls_s, bb_p = rh.apply(rv, fs)
            props, valid = get_proposals(
                cls_s, bb_p, cfg.rpn, (h, w), 1000, 1000,
                valid_shapes=jnp.tile(
                    jnp.asarray([[375.0, 1242.0]]), (B, 1)
                ),
            )
            return props
        timeit("rpn+proposals", prop_fn, *rpn_feats)


if __name__ == "__main__":
    main()
