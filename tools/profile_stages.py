"""Stage-ladder profiler: times cumulative pipeline prefixes on the TPU.

Each stage prefix reproduces the detector's *actual* inference path
(models/detector.py:112-314), including the Pallas RoIAlign dispatch, so
the deltas between rows are the true per-stage costs. Runs each prefix
inside an on-device lax.fori_loop with dynamic trip count (the remote
tunnel makes host-side per-call timing unreliable); reports the slope
between two trip counts. Usage:
    python tools/profile_stages.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.coders import DimCoder, NOCCoder, ProjErrorCoder
from monorun_tpu.config import get_config
from monorun_tpu.models.detector import _align_strides
from monorun_tpu.models import init_detector
from monorun_tpu.models.bbox_head import get_det_bboxes
from monorun_tpu.models.global_head import slice_pred
from monorun_tpu.models.rpn import get_proposals
from monorun_tpu.ops.pnp import PnPConfig, pnp_uncert
from monorun_tpu.ops.roi_align import (
    multilevel_roi_align_auto,
    roi_grid_centers,
)
from monorun_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 4
N_SHORT, N_LONG = 4, 16


def main():
    import threading

    # pay the tunnel's one-time first-fetch wall early (see bench.py)
    threading.Thread(
        target=lambda: float(
            jax.jit(lambda a: a + 1.0)(jnp.zeros((8, 128), jnp.float32))[0, 0]
        ),
        daemon=True,
    ).start()

    cfg = get_config("kitti_multiclass")
    h, w = cfg.data.pad_height, cfg.data.pad_width
    model, variables = init_detector(cfg, jax.random.PRNGKey(0), (h, w),
                                     fast=True)
    from monorun_tpu.apis.inference import _precast_kernels

    variables = _precast_kernels(cfg, variables)
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
    B = BATCH
    pad_shape = (h, w)

    def upto_backbone(m, x):
        feats = m.extract_feats(x)
        return feats, None

    def upto_rpn(m, x):
        feats = m.extract_feats(x)
        cls_scores, bbox_preds = m.run_rpn(feats)
        props, valid = get_proposals(
            cls_scores, bbox_preds, cfg.rpn, pad_shape,
            tc.rpn_nms_pre, tc.rpn_nms_post, valid_shapes=shapes)
        return feats, (props, valid)

    def _mk_rois(props):
        P = props.shape[1]
        bc = jnp.repeat(jnp.arange(B, dtype=props.dtype), P)
        return jnp.concatenate([bc[:, None], props.reshape(-1, 4)], 1), P

    def upto_align(m, x):
        feats, (props, valid) = upto_rpn(m, x)
        rois, P = _mk_rois(props)
        rf = multilevel_roi_align_auto(
            feats[: len(cfg.bbox_head.featmap_strides)], rois,
            _align_strides(cfg, cfg.bbox_head.featmap_strides), (7, 7),
            cfg.bbox_head.finest_scale, max_ratio=cfg.bbox_head.align_max_ratio, tile_h=24)
        return feats, rf

    def upto_bbox(m, x):
        feats, (props, valid) = upto_rpn(m, x)
        rois, P = _mk_rois(props)
        rf = multilevel_roi_align_auto(
            feats[: len(cfg.bbox_head.featmap_strides)], rois,
            _align_strides(cfg, cfg.bbox_head.featmap_strides), (7, 7),
            cfg.bbox_head.finest_scale, max_ratio=cfg.bbox_head.align_max_ratio, tile_h=24)
        cls_logits, deltas = m.bbox_head(rf)
        det = jax.vmap(lambda r, cl, dl, vv: get_det_bboxes(
            r, cl, dl, vv, pad_shape, cfg.bbox_head, tc.score_thr,
            tc.nms_iou_thr, M))(
            props, cls_logits.reshape(B, P, -1),
            deltas.reshape(B, P, -1), valid)
        return feats, det

    # head-slot bucketing exactly as the serving graph (detector.py):
    # NMS slots come out score-sorted, the 3D heads see the top K only
    K = tc.head_slots if 0 < tc.head_slots < M else M

    def _dets(m, x):
        feats, det = upto_bbox(m, x)
        det_boxes, det_scores, det_labels, det_valid = det
        det_labels = jnp.clip(det_labels, 0, cfg.bbox_head.num_classes - 1)
        hd_boxes = det_boxes[:, :K]
        db = jnp.repeat(jnp.arange(B, dtype=det_boxes.dtype), K)
        det_rois = jnp.concatenate(
            [db[:, None], hd_boxes.reshape(B * K, 4)], axis=1)
        return feats, det_rois, det_labels[:, :K].reshape(B * K)

    def upto_global(m, x):
        feats, det_rois, flat_labels = _dets(m, x)
        rf = multilevel_roi_align_auto(
            feats[: len(cfg.bbox_head.featmap_strides)], det_rois,
            _align_strides(cfg, cfg.bbox_head.featmap_strides), (7, 7),
            cfg.bbox_head.finest_scale, max_ratio=cfg.bbox_head.align_max_ratio, tile_h=24)
        gout = m.global_head(rf, train=False, rng=key)
        dim_enc, dim_var_enc, latent, latent_var = slice_pred(
            cfg.global_head, gout.dim_latent_pred, gout.dim_latent_var,
            flat_labels)
        dims, dims_var = DimCoder(
            cfg.global_head.dim_means, cfg.global_head.dim_stds
        ).decode(dim_enc, dim_var_enc, flat_labels)
        return feats, (dims, latent)

    def upto_noc(m, x):
        feats, det_rois, flat_labels = _dets(m, x)
        rf = multilevel_roi_align_auto(
            feats[: len(cfg.bbox_head.featmap_strides)], det_rois,
            _align_strides(cfg, cfg.bbox_head.featmap_strides), (7, 7),
            cfg.bbox_head.finest_scale, max_ratio=cfg.bbox_head.align_max_ratio, tile_h=24)
        gout = m.global_head(rf, train=False, rng=key)
        dim_enc, dim_var_enc, latent, latent_var = slice_pred(
            cfg.global_head, gout.dim_latent_pred, gout.dim_latent_var,
            flat_labels)
        dims, dims_var = DimCoder(
            cfg.global_head.dim_means, cfg.global_head.dim_stds
        ).decode(dim_enc, dim_var_enc, flat_labels)
        nf = multilevel_roi_align_auto(
            feats[: len(cfg.noc_head.featmap_strides)], det_rois,
            _align_strides(cfg, cfg.noc_head.featmap_strides),
            (cfg.noc_head.roi_size, cfg.noc_head.roi_size),
            cfg.noc_head.finest_scale, max_ratio=cfg.noc_head.align_max_ratio, tile_h=32)
        flip = jnp.zeros((B * K,), bool)
        nout = m.noc_head(nf, latent, flat_labels, flip, train=False)
        coords_3d, coords_3d_var = NOCCoder(
            cfg.noc_head.noc_means, cfg.noc_head.noc_stds
        ).decode(nout.noc_pred, None, dims, dims_var, flip)
        proj_logstd = ProjErrorCoder(
            cfg.projection_head.ref_length, cfg.projection_head.ref_focal_y,
            cfg.projection_head.target_std,
        ).decode_logstd(nout.proj_logstd, coords_3d_var, None)
        return feats, (coords_3d, proj_logstd, det_rois)

    def upto_pnp(m, x):
        feats, (coords_3d, proj_logstd, det_rois) = upto_noc(m, x)
        dsz = cfg.noc_head.dense_size
        coords_2d_roi = roi_grid_centers(det_rois, (dsz, dsz))
        istd = jnp.exp(-proj_logstd) / cfg.pose_head.std_scale
        n_pts = dsz * dsz
        spd = jnp.repeat(shapes, K, axis=0)
        border = cfg.pose_head.allowed_border
        u_range = jnp.stack(
            [jnp.full((B * K,), -border), spd[:, 1] + border], -1)
        v_range = jnp.stack(
            [jnp.full((B * K,), -border), spd[:, 0] + border], -1)
        rh = coords_2d_roi[:, -1, 0, 1] - coords_2d_roi[:, 0, 0, 1]
        pnp = pnp_uncert(
            coords_2d_roi.reshape(B * K, n_pts, 2),
            istd.reshape(B * K, n_pts, 2),
            coords_3d.reshape(B * K, n_pts, 3),
            jnp.repeat(cam, K, axis=0), u_range, v_range,
            ransac_thr=cfg.pose_head.epnp_ransac_thres_ratio * rh,
            rng=key,
            cfg=PnPConfig(
                z_min=cfg.pose_head.z_min,
                istd_thres=cfg.pose_head.epnp_istd_thres,
                inlier_opt_only=cfg.pose_head.inlier_opt_only,
                ransac_hypotheses=cfg.pose_head.ransac_hypotheses,
                lm_iters=cfg.pose_head.lm_iters))
        return feats, (pnp.t_vec, pnp.yaw, pnp.pose_cov)

    def fwd_full(m, x):
        det = m(x, cam, shapes, key)
        return jnp.sum(det.bboxes_3d)

    def _chk(out):
        feats, extra = out
        s = sum(jnp.sum(f[..., 0].astype(jnp.float32)) for f in feats)
        if extra is not None:
            s = s + sum(
                jnp.sum(e.astype(jnp.float32)) for e in jax.tree.leaves(extra)
            )
        return s

    def make_loop(fwd, wrap=True):
        # variables closed over = compile-time constants, matching the
        # frozen-weight serving path (see apis/inference.InferenceSession)
        def run_n(images, n):
            def body(i, carry):
                r = model.apply(variables, images + carry * 1e-12, method=fwd)
                return _chk(r) if wrap else r
            return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0))
        return jax.jit(run_n)

    for name, fwd, wrap in [
        ("backbone+fpn", upto_backbone, True),
        ("+rpn+proposals", upto_rpn, True),
        ("+align(pallas)", upto_align, True),
        ("+bboxhead+nms", upto_bbox, True),
        ("+global(MC)", upto_global, True),
        ("+noc head", upto_noc, True),
        ("+pnp", upto_pnp, True),
        ("full pipeline", fwd_full, False),
    ]:
        fn = make_loop(fwd, wrap)
        float(fn(images, 1))   # compile
        def t(n):
            t0 = time.time()
            float(fn(images, n))
            return time.time() - t0
        t(1)
        per = (min(t(N_LONG), t(N_LONG)) - min(t(N_SHORT), t(N_SHORT))) / (
            N_LONG - N_SHORT
        )
        print(f"{name:>16}: {per * 1000:8.2f} ms/step "
              f"({BATCH / per:8.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
