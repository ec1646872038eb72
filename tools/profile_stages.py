"""Stage-ladder profiler: times cumulative pipeline prefixes on the TPU.

Runs each stage inside an on-device lax.fori_loop with dynamic trip count
(the remote tunnel makes host-side per-call timing unreliable); reports
the slope between two trip counts. Usage:
    python tools/profile_stages.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.config import get_config
from monorun_tpu.models import init_detector
from monorun_tpu.models.bbox_head import get_det_bboxes
from monorun_tpu.models.global_head import slice_pred
from monorun_tpu.models.rpn import get_proposals
from monorun_tpu.ops.roi_align import multilevel_roi_align

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_SHORT, N_LONG = 4, 16


def main():
    cfg = get_config("kitti_multiclass")
    h, w = cfg.data.pad_height, cfg.data.pad_width
    model, variables = init_detector(cfg, jax.random.PRNGKey(0), (h, w))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (BATCH, h, w, 3)).astype(np.float32))
    cam = jnp.asarray(np.tile(
        np.array([[721.5, 0, 609.6], [0, 721.5, 172.9], [0, 0, 1]], np.float32),
        (BATCH, 1, 1)))
    shapes = jnp.asarray(np.tile(np.asarray([[375.0, 1242.0]], np.float32),
                                 (BATCH, 1)))
    key = jax.random.PRNGKey(1)
    tc = cfg.test
    M = tc.max_per_img

    def fwd_backbone(m, x):
        feats = m.extract_feats(x)
        return sum(jnp.sum(f[..., 0].astype(jnp.float32)) for f in feats)

    def fwd_rpn(m, x):
        feats = m.extract_feats(x)
        cls_scores, bbox_preds = m.run_rpn(feats)
        props, valid = get_proposals(
            cls_scores, bbox_preds, cfg.rpn, (h, w),
            tc.rpn_nms_pre, tc.rpn_nms_post, valid_shapes=shapes)
        return jnp.sum(props) + jnp.sum(valid)

    def fwd_align(m, x):
        feats = m.extract_feats(x)
        cls_scores, bbox_preds = m.run_rpn(feats)
        props, valid = get_proposals(
            cls_scores, bbox_preds, cfg.rpn, (h, w),
            tc.rpn_nms_pre, tc.rpn_nms_post, valid_shapes=shapes)
        P = props.shape[1]
        bc = jnp.repeat(jnp.arange(BATCH, dtype=props.dtype), P)
        rois = jnp.concatenate([bc[:, None], props.reshape(-1, 4)], 1)
        rf = multilevel_roi_align(
            feats[:5], rois, cfg.bbox_head.featmap_strides, (7, 7),
            finest_scale=cfg.bbox_head.finest_scale, max_ratio=3)
        return jnp.sum(rf.astype(jnp.float32))

    def fwd_bbox(m, x):
        feats = m.extract_feats(x)
        cls_scores, bbox_preds = m.run_rpn(feats)
        props, valid = get_proposals(
            cls_scores, bbox_preds, cfg.rpn, (h, w),
            tc.rpn_nms_pre, tc.rpn_nms_post, valid_shapes=shapes)
        P = props.shape[1]
        bc = jnp.repeat(jnp.arange(BATCH, dtype=props.dtype), P)
        rois = jnp.concatenate([bc[:, None], props.reshape(-1, 4)], 1)
        rf = multilevel_roi_align(
            feats[:5], rois, cfg.bbox_head.featmap_strides, (7, 7),
            finest_scale=cfg.bbox_head.finest_scale, max_ratio=3)
        cls_logits, deltas = m.bbox_head(rf)
        det = jax.vmap(lambda r, cl, dl, vv: get_det_bboxes(
            r, cl, dl, vv, (h, w), cfg.bbox_head, tc.score_thr,
            tc.nms_iou_thr, M))(
            props, cls_logits.reshape(BATCH, P, -1),
            deltas.reshape(BATCH, P, -1), valid)
        return jnp.sum(det[0]) + jnp.sum(det[1])

    def fwd_full(m, x):
        det = m(x, cam, shapes, key)
        return jnp.sum(det.bboxes_3d)

    def make_loop(fwd):
        def run_n(variables, images, n):
            def body(i, carry):
                return model.apply(
                    variables, images + carry * 1e-12, method=fwd
                )
            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0))
        return jax.jit(run_n)

    for name, fwd in [
        ("backbone+fpn", fwd_backbone),
        ("+rpn+proposals", fwd_rpn),
        ("+roi_align", fwd_align),
        ("+bboxhead+nms", fwd_bbox),
        ("full pipeline", fwd_full),
    ]:
        fn = make_loop(fwd)
        float(fn(variables, images, 1))   # compile
        def t(n):
            t0 = time.time()
            float(fn(variables, images, n))
            return time.time() - t0
        t(1)
        per = (min(t(N_LONG), t(N_LONG)) - min(t(N_SHORT), t(N_SHORT))) / (
            N_LONG - N_SHORT
        )
        print(f"{name:>16}: {per * 1000:8.2f} ms/step "
              f"({BATCH / per:8.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
