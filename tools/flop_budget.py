"""Per-stage FLOP budget of the flagship inference pipeline.

Lowers (traces, no backend compile) cumulative stage prefixes of the
kitti_multiclass inference graph at the bench shapes and prints XLA's
pre-optimization ``cost_analysis`` FLOP count per stage and per image.
Run on CPU (no TPU needed):

    JAX_PLATFORMS=cpu python tools/flop_budget.py [batch]

The absolute numbers are pre-fusion estimates (upper bounds on MXU work;
elementwise ops count too), but stage DELTAS are dominated by conv/matmul
FLOPs and match hand counts within ~10%. The output feeds the README
"FLOP budget" table that grounds the throughput targets.
"""

import sys

sys.path.insert(0, ".")

import jax

# pin CPU through jax.config (the axon plugin ignores JAX_PLATFORMS env);
# lowering is backend-independent and must not touch the TPU tunnel
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1
CONFIG = sys.argv[2] if len(sys.argv) > 2 else "kitti_multiclass"


def main():
    from monorun_tpu.config import get_config
    from monorun_tpu.models import init_detector

    cfg = get_config(CONFIG)
    h, w = cfg.data.pad_height, cfg.data.pad_width
    model, variables = init_detector(cfg, jax.random.PRNGKey(0), (h, w))

    B = BATCH
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (B, h, w, 3)).astype(np.float32))
    cam = jnp.asarray(np.tile(
        np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1]],
                 np.float32), (B, 1, 1)))
    shapes = jnp.asarray(np.tile(np.asarray([[375.0, 1242.0]], np.float32),
                                 (B, 1)))
    key = jax.random.PRNGKey(1)

    def flops_of(fn, *args):
        lowered = jax.jit(fn).lower(*args)
        ca = lowered.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))

    def backbone_only(v, x):
        return model.apply(v, x, method=lambda m, xx: m.backbone(xx))

    def backbone_fpn(v, x):
        return model.apply(v, x, method=lambda m, xx: m.extract_feats(xx))

    def fwd_full(v, x):
        det = model.apply(v, x, cam, shapes, key)
        return det.bboxes_3d

    rows = []
    prev = 0.0
    for name, fn in [
        ("backbone", backbone_only),
        ("backbone+fpn (incl. stride-2 level)", backbone_fpn),
        ("full pipeline", fwd_full),
    ]:
        f = flops_of(fn, variables, images)
        rows.append((name, f, f - prev))
        prev = f

    print(f"batch={B} image={h}x{w} (pre-optimization XLA cost_analysis)")
    for name, cum, delta in rows:
        print(f"{name:>38}: cum {cum / 1e9 / B:9.1f} GFLOP/img   "
              f"delta {delta / 1e9 / B:9.1f}")


if __name__ == "__main__":
    main()
