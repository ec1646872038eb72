"""Capture an xprof trace of the inference pipeline and print the HLO
op-time breakdown — the ground truth behind the stage ladder.

Runs the full kitti_multiclass pipeline on the real TPU, captures a
jax.profiler trace around a few steps, converts the xplane with xprof
(tensorboard-plugin-profile) and prints the top self-time ops grouped by
category. Usage:

    python tools/profile_trace.py [batch] [top_n]
"""

import glob
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
TOP_N = int(sys.argv[2]) if len(sys.argv) > 2 else 40
LOGDIR = "/tmp/monorun_prof"


def main():
    from monorun_tpu.config import get_config
    from monorun_tpu.models import init_detector

    cfg = get_config("kitti_multiclass")
    h, w = cfg.data.pad_height, cfg.data.pad_width
    # fast structural init: the traced init would compile the entire
    # forward a second time (minutes over the tunnel) before the traced
    # program even starts
    model, variables = init_detector(cfg, jax.random.PRNGKey(0), (h, w),
                                     fast=True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (BATCH, h, w, 3)).astype(np.float32))
    cam = jnp.asarray(np.tile(
        np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1]],
                 np.float32), (BATCH, 1, 1)))
    shapes = jnp.asarray(np.tile(np.asarray([[375.0, 1242.0]], np.float32),
                                 (BATCH, 1)))

    fn = jax.jit(lambda v, img, key: model.apply(v, img, cam, shapes, key))
    key = jax.random.PRNGKey(1)
    fn(variables, images, key).bboxes_3d.block_until_ready()   # compile

    jax.profiler.start_trace(LOGDIR)
    for i in range(3):
        out = fn(variables, images, jax.random.fold_in(key, i))
        out.bboxes_3d.block_until_ready()
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True))
    assert xplanes, "no xplane captured"
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats", {"tqx": "out:json"}
    )
    tbl = json.loads(data) if isinstance(data, (str, bytes)) else data
    if isinstance(tbl, list):
        tbl = tbl[0]
    cols = [c["label"] for c in tbl["cols"]]
    iN = cols.index("HLO op name")
    iF = cols.index("Framework op name")
    iS = cols.index("Total self time (us)")
    iC = cols.index("HLO op category")
    iB = cols.index("Bound by")
    entries = []
    for r in tbl["rows"]:
        c = [x["v"] if x else None for x in r["c"]]
        entries.append((
            float(c[iS]), str(c[iC]), str(c[iB]),
            str(c[iN]), str(c[iF]),
        ))
    entries.sort(reverse=True)
    total = sum(e[0] for e in entries)
    print(f"total self time: {total / 1e3 / 3:.2f} ms/step (3 steps)")
    for self_us, cat, bound, name, fw in entries[:TOP_N]:
        print(f"{self_us / 1e3 / 3:9.3f}ms {100 * self_us / total:5.1f}%"
              f" [{cat:>16}|{bound:>8}] {name[:32]} :: {fw[:60]}")

    import collections

    agg = collections.Counter()
    for self_us, cat, bound, name, fw in entries:
        agg["/".join(fw.split("/")[1:3])[:48]] += self_us
    print("\nby framework-op group (ms/step):")
    for k, v in agg.most_common(25):
        print(f"{v / 1e3 / 3:9.3f}  {k}")


if __name__ == "__main__":
    main()
