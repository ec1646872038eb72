"""Inference throughput benchmark on the real TPU chip.

Runs the flagship kitti_multiclass pipeline (full ResNet-101, 1000
proposals, 100 detections, 50 MC samples, batched PnP) on KITTI-sized
inputs and reports frames/sec/chip.

Baseline: the reference reports ~0.07 s/frame (~14.3 fps) on an
unspecified GPU (KITTI leaderboard entry; see BASELINE.md) — vs_baseline
is measured fps over that. The driver parses the single JSON line on
stdout.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
# which param subtrees are baked into the executable as constants;
# "none" is the serving default (same fps as baking, minutes less compile)
FREEZE = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "MONORUN_FREEZE", "none"
)
# The driver's headline metric is the flagship parity-FLOP config; the
# fast presets (config._fast, architectural cuts) are benchmarked by
# setting MONORUN_BENCH_CONFIG=kitti_multiclass_fast[_r50] by hand and
# reported separately in README 'Fast presets'.
CONFIG = os.environ.get("MONORUN_BENCH_CONFIG", "kitti_multiclass")
# split=1 serves via the TWO warm-start executables (backbone, heads)
# called back to back instead of one monolithic jit: the first batch then
# pays ~0 extra compile on top of the warm-up itself. Requires
# freeze="none" (the executables take the full variable tree as an arg)
# and warm-up itself: MONORUN_WARM_START=0 (the no-warm A/B baseline)
# therefore also disables split.
WARM = os.environ.get("MONORUN_WARM_START", "1") == "1"
SPLIT = os.environ.get("MONORUN_SPLIT", "1" if FREEZE == "none" else "0")
SPLIT = SPLIT == "1" and FREEZE == "none" and WARM
# RAW=1 (default) benches the uint8-canvas serving program: on-device
# resize/normalize/pad fused in front of the backbone
# (data/pipeline.py:device_preprocess) — the full preprocessing-inclusive
# pipeline the driver's north star describes. RAW=0 keeps the
# pre-normalized f32 input program for A/B.
RAW = os.environ.get("MONORUN_RAW", "1") == "1"
ITERS = 20


def main():
    import threading

    from monorun_tpu.config import get_config
    from monorun_tpu.models import init_detector

    t_proc = time.time()

    # the axon tunnel stalls minutes on the FIRST host fetch of device
    # data in a process — measured 116.7 s for float(jit(x+1)(zeros)[0,0])
    # in an otherwise empty process, and 116-667 s across probes,
    # independent of program size or compile path (AOT vs traced); the
    # second fetch takes 0.5 s. BENCH_r04's unexplained 407.5 s
    # compile+first was exactly this wall, paid serially after warm+init.
    # Trigger the fetch IMMEDIATELY in a daemon thread so the wall
    # overlaps the warm-up compiles and the parameter build; the thread's
    # stall does not block other host threads or device dispatches.
    def _open_fetch_channel():
        t0 = time.time()
        try:
            float(
                jax.jit(lambda a: a + 1.0)(
                    jnp.zeros((8, 128), jnp.float32)
                )[0, 0]
            )
            print(
                f"[channel] first-fetch wall: {time.time() - t0:.1f}s",
                file=sys.stderr,
            )
        except Exception as e:  # pragma: no cover - diagnostics only
            print(f"[channel] open failed: {e}", file=sys.stderr)

    chan_thread = threading.Thread(target=_open_fetch_channel, daemon=True)
    chan_thread.start()
    cfg = get_config(CONFIG)
    h, w = cfg.data.pad_height, cfg.data.pad_width
    print(
        f"devices={jax.devices()} batch={BATCH} img={h}x{w}",
        file=sys.stderr,
    )

    # parallel cold-start warm-up: AOT-compile the serving program's
    # heavy pieces (backbone, heads, 3 Pallas align kernels) concurrently
    # while the structural init builds parameters — the final jit below
    # then assembles from warm sub-compiles (utils/warm_start.py)
    warm_times = {}
    warm_progs = {}

    def _warm():
        from monorun_tpu.models.detector import MonoRUn
        from monorun_tpu.utils.warm_start import warm_start

        pieces = ("band", "sorted7", "sorted14", "backbone", "heads")
        if SPLIT:
            pieces += ("carry_in", "checksum")
        times, progs = warm_start(
            cfg, MonoRUn(cfg), BATCH, verbose=True, return_programs=True,
            pieces=pieces, raw=RAW,
        )
        warm_times.update(times)
        warm_progs.update(progs)

    warm_thread = None
    if WARM:
        warm_thread = threading.Thread(target=_warm, daemon=True)
        warm_thread.start()

    # fast structural init: the traced init compiles the whole forward
    # program (250-720 s cold over the tunnel, tools/cold_profile.py)
    t0 = time.time()
    model, variables = init_detector(
        cfg, jax.random.PRNGKey(0), (h, w), fast=True
    )
    from monorun_tpu.apis.inference import _precast_kernels

    variables = _precast_kernels(cfg, variables)
    print(f"init+precast: {time.time() - t0:.1f}s", file=sys.stderr)
    if warm_thread is not None:
        warm_thread.join()
        print(
            "warm_start: "
            + " ".join(f"{k}={v:.1f}s" for k, v in warm_times.items()),
            file=sys.stderr,
        )

    # inputs are generated ON DEVICE: host->device uploads through the
    # remote tunnel are slow (3-20 s for this 47 MB batch) and have no
    # business inside a cold-start measurement
    s = cfg.data.test_scale
    cam_native = jnp.tile(
        jnp.asarray(
            [[721.5, 0.0, 609.6], [0.0, 721.5, 172.9], [0.0, 0.0, 1.0]],
            jnp.float32,
        ),
        (BATCH, 1, 1),
    )
    if RAW:
        # uint8 native-resolution canvas, preprocessing runs on device
        images = jax.random.randint(
            jax.random.PRNGKey(3),
            (BATCH, cfg.data.raw_height, cfg.data.raw_width, 3),
            0, 256, jnp.uint8,
        )
        raw_shapes = jnp.tile(
            jnp.asarray([[375.0, 1242.0]], jnp.float32), (BATCH, 1)
        )
        from monorun_tpu.data.pipeline import scale_intrinsics

        cam = scale_intrinsics(cam_native, s)
        shapes = jnp.round(raw_shapes * s)
    else:
        images = jax.random.normal(
            jax.random.PRNGKey(3), (BATCH, h, w, 3), jnp.float32
        )
        cam = cam_native
        shapes = jnp.tile(
            jnp.asarray([[375.0 * s, 1242.0 * s]], jnp.float32),
            (BATCH, 1),
        )

    # FREEZE controls constants-vs-args, matching the serving path
    # (InferenceSession); the measured default is "none" — see inference.py.
    import flax

    allvars = flax.core.unfreeze(variables)
    params = dict(allvars["params"])
    other = {k: v for k, v in allvars.items() if k != "params"}
    baked_keys = {
        "all": set(params),
        "backbone": {"backbone", "neck"},
        "none": set(),
    }[FREEZE]
    const_p = {k: v for k, v in params.items() if k in baked_keys}
    live_p = {k: v for k, v in params.items() if k not in baked_keys}
    print(f"freeze={FREEZE} baked={sorted(baked_keys)}", file=sys.stderr)

    # the PLAIN per-batch program — exactly what InferenceSession serves.
    # Earlier rounds benchmarked a lax.fori_loop-wrapped monolith; its
    # compile alone takes 10-17+ min through the tunnel (XLA while-loop
    # passes over the full-detector body) and was the whole cold-start
    # story (625-869 s driver artifacts). No serving system loops 20
    # inferences inside one program, so the cold metric is the plain
    # program; `carry` threads a data dependency between chained calls
    # for the steady-state measurement below.
    # split mode needs every warmed executable; if the warm thread died
    # (compile-service error, OOM) fall back to the monolithic jit so the
    # headline metric survives a warm-up failure (warm-up is best-effort)
    split = SPLIT
    if split:
        need = ("carry_in", "checksum", "backbone", "heads")
        missing = [k for k in need if k not in warm_progs]
        if missing:
            print(
                f"warm-up incomplete (missing {missing}); falling back "
                "to the monolithic jit",
                file=sys.stderr,
            )
            split = False

    if split:
        # two chained executables (compiled by the warm-up at exactly
        # these avals); `_carry_in` keeps the chain's data dependency and
        # `_checksum` collapses the output — both tiny programs
        allvars = {**other, "params": params}
        _carry_in = warm_progs["carry_in"]
        _checksum = warm_progs["checksum"]

        if RAW:
            def jfwd(live, img, key, carry):
                feats = warm_progs["backbone"](
                    allvars, _carry_in(img, carry), raw_shapes
                )
                det = warm_progs["heads"](allvars, feats, cam, shapes, key)
                return _checksum(det)

        else:
            def jfwd(live, img, key, carry):
                feats = warm_progs["backbone"](
                    allvars, _carry_in(img, carry)
                )
                det = warm_progs["heads"](allvars, feats, cam, shapes, key)
                return _checksum(det)

    elif RAW:
        def fwd(live, img, key, carry):
            det = model.apply(
                {**other, "params": {**const_p, **live}},
                img + (carry * 0.0).astype(img.dtype),
                cam_native, raw_shapes, key,
                method=model.serve_raw,
            )
            return jnp.sum(det.bboxes_3d)

        jfwd = jax.jit(fwd)

    else:
        def fwd(live, img, key, carry):
            det = model.apply(
                {**other, "params": {**const_p, **live}},
                img + carry * 0.0, cam, shapes, key,
            )
            return jnp.sum(det.bboxes_3d)

        jfwd = jax.jit(fwd)

    # join the channel opener so compile+first reads genuine program cost,
    # not the tail of the first-fetch wall (cold total includes both ways)
    chan_thread.join()

    # ---- self-validation: one structured scene through the REAL serving
    # program before timing (split mode only — the monolithic jfwd only
    # exposes the checksum). Catches a serving program that regresses to
    # garbage (NaN poses, all-invalid slots) which random-noise checksums
    # cannot. Weights are random here, so the bar is structural: finite
    # outputs and >= 1 valid detection slot across the batch.
    if split and os.environ.get("MONORUN_BENCH_VALIDATE", "1") == "1":
        from monorun_tpu.utils.synthetic import synthetic_scene_batch

        scene = synthetic_scene_batch(
            cfg, BATCH,
            (cfg.data.raw_height, cfg.data.raw_width) if RAW else (h, w),
            seed=11,
        )
        v_cam = jnp.asarray(scene["cam"], jnp.float32)
        allv = {**other, "params": params}
        if RAW:
            # scene images are already in normalized space: de-normalize
            # to the uint8 camera domain; the device re-normalizes
            mean = np.asarray(cfg.data.img_mean, np.float32)
            std = np.asarray(cfg.data.img_std, np.float32)
            v_img = jnp.asarray(
                np.clip(scene["images"] * std + mean, 0, 255
                        ).astype(np.uint8)
            )
            v_feats = warm_progs["backbone"](
                allv, v_img, raw_shapes
            )
            from monorun_tpu.data.pipeline import scale_intrinsics

            v_det = warm_progs["heads"](
                allv, v_feats, scale_intrinsics(v_cam, s), shapes,
                jax.random.PRNGKey(5),
            )
        else:
            v_feats = warm_progs["backbone"](
                allv, jnp.asarray(scene["images"], jnp.float32)
            )
            v_det = warm_progs["heads"](
                allv, v_feats, v_cam, shapes, jax.random.PRNGKey(5),
            )
        v_valid = np.asarray(v_det.valid)
        v_b3d = np.asarray(v_det.bboxes_3d)
        v_cov = np.asarray(v_det.pose_cov)
        n_valid = int(v_valid.sum())
        finite = bool(
            np.isfinite(v_b3d).all() and np.isfinite(v_cov).all()
        )
        print(
            f"validate: {n_valid} valid detections, finite={finite}",
            file=sys.stderr,
        )
        if not finite or n_valid < 1:
            print(
                json.dumps({
                    "metric": "kitti_inference_frames_per_sec_per_chip",
                    "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
                    "error": "serving program failed scene validation",
                })
            )
            sys.exit(1)
    t0 = time.time()
    checksum = float(
        jfwd(live_p, images, jax.random.PRNGKey(1), jnp.float32(0))
    )
    print(
        f"compile+first: {time.time() - t0:.1f}s checksum={checksum:.3f}",
        file=sys.stderr,
    )
    print(
        f"cold total (init+warm+compile+first): "
        f"{time.time() - t_proc:.1f}s",
        file=sys.stderr,
    )

    # steady state: chain n dispatches with a carry data dependency and
    # close with ONE host fetch (block_until_ready does not wait through
    # the tunnel; per-call host timing reads dispatch, not device time).
    # Slope between two chain lengths removes the fixed dispatch+fetch
    # overhead. Dispatches are async, so the host keeps ~n calls queued
    # while the device executes sequentially through the carry chain.
    def chain(n: int) -> float:
        t0 = time.time()
        carry = jnp.float32(0)
        for i in range(n):
            carry = jfwd(
                live_p, images,
                jax.random.fold_in(jax.random.PRNGKey(1), i), carry,
            )
        cs = float(carry)
        dt = time.time() - t0
        print(f"n={n} dt={dt:.3f}s checksum={cs:.3f}", file=sys.stderr)
        return dt

    chain(2)  # one more warm call before timing
    n_short, n_long = max(ITERS // 4, 1), ITERS
    t_short = min(chain(n_short), chain(n_short))
    t_long = min(chain(n_long), chain(n_long))
    per_iter = (t_long - t_short) / (n_long - n_short)
    fps = BATCH / per_iter
    baseline_fps = 1.0 / 0.07
    print(
        json.dumps(
            {
                "metric": "kitti_inference_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
