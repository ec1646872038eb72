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
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ITERS = 20


def main():
    from monorun_tpu.config import get_config
    from monorun_tpu.models import init_detector

    cfg = get_config("kitti_multiclass")
    h, w = cfg.data.pad_height, cfg.data.pad_width
    print(
        f"devices={jax.devices()} batch={BATCH} img={h}x{w}",
        file=sys.stderr,
    )

    model, variables = init_detector(cfg, jax.random.PRNGKey(0), (h, w))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(0, 1, (BATCH, h, w, 3)).astype(np.float32)
    )
    cam = jnp.asarray(
        np.tile(
            np.array(
                [[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1]],
                np.float32,
            ),
            (BATCH, 1, 1),
        )
    )
    shapes = jnp.asarray(
        np.tile(np.asarray([[375.0, 1242.0]], np.float32), (BATCH, 1))
    )

    fn = jax.jit(model.apply)
    t0 = time.time()
    out = fn(variables, images, cam, shapes, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    # warmup
    for i in range(3):
        out = fn(variables, images, cam, shapes, jax.random.PRNGKey(i))
    jax.block_until_ready(out)

    t0 = time.time()
    for i in range(ITERS):
        out = fn(variables, images, cam, shapes, jax.random.PRNGKey(i))
    jax.block_until_ready(out)
    dt = time.time() - t0

    fps = BATCH * ITERS / dt
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
