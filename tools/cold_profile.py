"""Cold-start breakdown on the real TPU: init / lower / compile / first-run.

The driver's BENCH artifact measures `compile+first` of the full serving
program in a FRESH environment (empty persistent cache), so this tool
reproduces that cold path deliberately:

* the persistent compilation cache is pointed at a fresh temp dir,
* a per-run salt constant is folded into the program so neither the
  client cache nor any server-side executable cache can serve a hit,
* inputs are generated ON DEVICE (host->device uploads through the axon
  tunnel run at ~MB/s and would pollute the numbers).

Usage:
    python tools/cold_profile.py [batch] [align_impl] [stage]

align_impl: auto | gather | sorted | band   (MONORUN_ALIGN_IMPL)
stage:      full | backbone | det | heads
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
IMPL = sys.argv[2] if len(sys.argv) > 2 else "auto"
STAGE = sys.argv[3] if len(sys.argv) > 3 else "full"

os.environ["MONORUN_ALIGN_IMPL"] = IMPL
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="coldcc_")

_T0 = time.time()
_LAST = [_T0]


def mark(label: str) -> None:
    now = time.time()
    print(
        f"[cold {IMPL}/{STAGE}] {label:>28}: {now - _LAST[0]:8.1f}s "
        f"(total {now - _T0:7.1f}s)",
        flush=True,
    )
    _LAST[0] = now


SALT = float(int(_T0) % 100000) * 1e-12   # unique program fingerprint

import jax            # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np    # noqa: E402

from monorun_tpu.config import get_config          # noqa: E402
from monorun_tpu.models import init_detector       # noqa: E402

mark("imports")


def main():
    cfg = get_config("kitti_multiclass")
    h, w = cfg.data.pad_height, cfg.data.pad_width
    print(f"devices={jax.devices()} batch={BATCH} salt={SALT}", flush=True)
    mark("backend init")

    fast = os.environ.get("MONORUN_FAST_INIT", "1") == "1"
    model, variables = init_detector(
        cfg, jax.random.PRNGKey(0), (h, w), fast=fast
    )
    # sync: fetch one small leaf
    float(jnp.sum(variables["params"]["cov_calib_logscale"]))
    mark(f"init_detector (fast={fast})")

    from monorun_tpu.apis.inference import _precast_kernels

    variables = _precast_kernels(cfg, variables)
    float(jnp.sum(variables["params"]["cov_calib_logscale"]))
    mark("precast")

    key = jax.random.PRNGKey(1)
    images = jax.random.normal(key, (BATCH, h, w, 3), jnp.float32)
    cam = jnp.tile(
        jnp.asarray(
            [[721.5, 0.0, 609.6], [0.0, 721.5, 172.9], [0.0, 0.0, 1.0]],
            jnp.float32,
        ),
        (BATCH, 1, 1),
    )
    shapes = jnp.tile(jnp.asarray([[375.0, 1242.0]], jnp.float32), (BATCH, 1))
    float(jnp.sum(images[0, 0, 0]))
    mark("on-device inputs")

    if STAGE == "backbone":
        def fwd(v, img, c, s, k):
            feats = model.apply(v, img + SALT, method=lambda m, x:
                                m.extract_feats(x))
            return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
    else:
        def fwd(v, img, c, s, k):
            det = model.apply(v, img + SALT, c, s, k)
            return jnp.sum(det.bboxes_3d)

    args = (variables, images, cam, shapes, jax.random.PRNGKey(2))
    jfn = jax.jit(fwd)
    lowered = jfn.lower(*args)
    mark("trace+lower")
    compiled = lowered.compile()
    mark("compile")
    out = compiled(*args)
    v1 = float(out)
    mark("first exec+fetch")
    v2 = float(compiled(*args))
    mark("second exec+fetch")
    print(f"checksum {v1:.3f} / {v2:.3f}", flush=True)

    # how much of a driver cold start is the 47MB input upload?
    host = np.random.default_rng(0).normal(
        0, 1, (BATCH, h, w, 3)
    ).astype(np.float32)
    up = jnp.asarray(host)
    float(jnp.sum(up[0, 0, 0]))
    mark(f"host upload {host.nbytes / 1e6:.0f}MB")


if __name__ == "__main__":
    main()
