"""End-to-end closure: train -> full inference path -> KITTI AP.

The reference's only correctness oracle is train -> test.py -> KITTI AP
(/root/reference/tools/test.py:208-217, kitti3d_dataset.py:198-228). No
KITTI data or released checkpoints exist in this environment, so this is
the in-env analogue: memorize a handful of geometrically-consistent
synthetic scenes (utils/synthetic.synthetic_scene_batch — image texture
IS the NOC encoding, LiDAR-style sparse supervision is pinhole-exact),
then push the TRAINED weights through the full fixed-shape inference
program (RPN -> R-CNN -> MC global head -> NOC -> PnP -> score -> 3D
NMS) and the full KITTI evaluator, and assert non-trivial 3D AP.

This is the only in-env test that can catch a sign/weighting error in
loss_calib/loss_score or a train/inference skew in the NOC/PnP plumbing:
every other probe stops at "losses fall".
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monorun_tpu.config import get_config
from monorun_tpu.train import create_train_state, train_step
from monorun_tpu.utils.synthetic import synthetic_scene_batch

pytestmark = pytest.mark.heavy  # full-graph compiles + a training run

HW = (96, 192)
N_STEPS = 420
B = 2
N_SCENES = 6          # 6 batches x 2 images = 12 fixed images, 24 GT.
# 24 GT matters: the devkit R40 protocol derives score thresholds from
# TP ranks, at most one per GT, and divides the precision sum by 40
# (eval.py get_thresholds/get_mAP) — with G valid GT even PERFECT
# detections score only min(G, 41)/40 * 100. 24 GT puts the ceiling at
# 60 AP, high enough for a meaningful assertion.


def nano_config():
    """kitti_car_lidar_supv shrunk for a 1-core-CPU training run: depth-26
    backbone, 64-channel neck, narrow FCs. Graph STRUCTURE (losses, heads,
    PnP, schedule) is the flagship one."""
    cfg = get_config("kitti_car_lidar_supv")
    return dataclasses.replace(
        cfg,
        compute_dtype="float32",
        backbone=dataclasses.replace(cfg.backbone, depth=26),
        # align_max_ratio back to 3/2 (flagship default is the mmcv-exact
        # 6/4, config.py): the nano memorizes point-sampled NOISE
        # textures, and averaging up to 6x6 samples per bin low-passes
        # exactly the signal it memorizes — measured 3d@0.5 AP 46.7 at
        # caps 3/2 vs 12.2 at 6/4 on identical training. Real-KITTI
        # models see natural images where the caps are parity-relevant
        # (tests/test_golden_detector.py); the oracle here needs the
        # sharp sampling to keep its AP bars meaningful.
        neck=dataclasses.replace(cfg.neck, out_channels=64),
        rpn=dataclasses.replace(
            cfg.rpn, nms_pre=48, nms_post=48, train_nms_pre=48,
            feat_channels=64,
        ),
        bbox_head=dataclasses.replace(
            cfg.bbox_head, in_channels=64, fc_out_channels=256,
            align_max_ratio=3,
        ),
        global_head=dataclasses.replace(
            cfg.global_head, in_channels=64, fc_out_channels=256,
            mc_samples=4,
        ),
        noc_head=dataclasses.replace(
            cfg.noc_head, in_channels=64, conv_out_channels=64,
            carafe_compressed_channels=16, align_max_ratio=2,
        ),
        score_head=dataclasses.replace(
            cfg.score_head, reg_fc_out_channels=256,
            pose_fc_out_channels=256, fc_out_channels=64,
        ),
        pose_head=dataclasses.replace(
            cfg.pose_head, ransac_hypotheses=8, lm_iters=5,
        ),
        train=dataclasses.replace(
            cfg.train, rcnn_num_samples=32, max_pos=8, rpn_num_samples=64,
            lr=1.0e-3, warmup_iters=40, grad_clip_norm=35.0,
        ),
        test=dataclasses.replace(
            cfg.test, rpn_nms_pre=48, rpn_nms_post=48, max_per_img=8,
        ),
    )


@pytest.fixture(scope="module")
def trained():
    cfg = nano_config()
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), total_steps=N_STEPS, image_shape=HW
    )
    batches = [
        synthetic_scene_batch(
            cfg, B, HW, num_gt=4, num_pts=256, seed=40 + i, n_objects=2
        )
        for i in range(N_SCENES)
    ]
    jbatches = [jax.tree.map(jnp.asarray, b) for b in batches]
    step = jax.jit(lambda s, b, r: train_step(model, tx, s, b, r))
    hist: dict = {}
    for i in range(N_STEPS):
        state, metrics = step(
            state, jbatches[i % N_SCENES], jax.random.PRNGKey(5000 + i)
        )
        for k, v in metrics.items():
            hist.setdefault(k, []).append(float(v))
        if i >= 240 and np.mean(hist["mean_iou"][-12:]) > 0.55:
            break
    return cfg, state, batches, hist


def test_no_nonfinite_gradients_over_trajectory(trained):
    """A where-grad trap regression would train slightly worse and pass
    every loss assertion; the zap_nonfinite counter must stay at ZERO."""
    _, _, _, hist = trained
    assert max(hist["nonfinite_grad_leaves"]) == 0, (
        hist["nonfinite_grad_leaves"]
    )


def test_training_reaches_valid_3d_poses(trained):
    """mean_iou (PnP pose vs GT 3D IoU on train RoIs) must leave zero and
    reach real overlap — the signal round-2's probe never produced."""
    _, _, _, hist = trained
    assert all(np.isfinite(hist["total_loss"]))
    assert float(np.mean(hist["mean_iou"][-8:])) > 0.3, (
        hist["mean_iou"][-10:]
    )


def _scale_batch(b, s):
    """Fast-preset content downscale: image and intrinsics scale together
    (data/pipeline.prepare_test_sample semantics) inside the same padded
    canvas; GT stays native — detections are mapped back by 1/s below."""
    import cv2

    imgs = np.asarray(b["images"])
    Bn, H, W = imgs.shape[:3]
    out = np.zeros_like(imgs)
    hs, ws = int(round(H * s)), int(round(W * s))
    for i in range(Bn):
        h, w = [int(v) for v in b["img_shapes"][i]]
        small = cv2.resize(
            imgs[i, :h, :w], (int(round(w * s)), int(round(h * s))),
            interpolation=cv2.INTER_LINEAR,
        )
        out[i, : small.shape[0], : small.shape[1]] = small
    cam = np.asarray(b["cam"]).copy()
    cam[:, :2] *= s
    shapes = np.asarray(b["img_shapes"]) * s
    return dict(b, images=out, cam=cam, img_shapes=shapes)


def _eval_trained(cfg, state, batches, scale=1.0):
    """Full inference path + official KITTI evaluator on the synthetic
    scenes; returns (summary, ap dict)."""
    from monorun_tpu.apis.inference import InferenceSession
    from monorun_tpu.eval.kitti_eval import kitti_eval

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sess = InferenceSession(cfg, variables, batch_size=B, freeze="none")

    gt_annos, det_annos = [], []
    for b in batches:
        if scale != 1.0:
            b = _scale_batch(b, scale)
        det = sess.run(b["images"], b["cam"], b["img_shapes"], seed=9)
        for i in range(B):
            # GT annotation (KITTI devkit schema)
            ok = b["gt_valid"][i]
            g3d = b["gt_bboxes_3d"][i][ok]
            loc = g3d[:, 3:6]
            gt_annos.append(
                dict(
                    name=np.asarray(["Car"] * len(g3d)),
                    truncated=np.zeros(len(g3d)),
                    occluded=np.zeros(len(g3d), np.int32),
                    alpha=g3d[:, 6] - np.arctan2(loc[:, 0], loc[:, 2]),
                    bbox=b["gt_boxes"][i][ok],
                    dimensions=g3d[:, :3],          # lhw
                    location=loc,
                    rotation_y=g3d[:, 6],
                    score=np.zeros(len(g3d)),
                )
            )
            # detections (format_results semantics, cam_t_vec = 0 here)
            keep = np.asarray(det.valid[i])
            b3d = np.asarray(det.bboxes_3d[i])[keep]
            b2d = np.asarray(det.bboxes_2d[i])[keep] / scale
            order = np.argsort(-b3d[:, 7])
            b3d, b2d = b3d[order], b2d[order]
            dloc = b3d[:, 3:6]
            det_annos.append(
                dict(
                    name=np.asarray(["Car"] * len(b3d)),
                    truncated=np.full(len(b3d), -1, np.int8),
                    occluded=np.full(len(b3d), -1, np.int8),
                    alpha=b3d[:, 6] - np.arctan2(dloc[:, 0], dloc[:, 2]),
                    bbox=b2d,
                    dimensions=b3d[:, :3],
                    location=dloc,
                    rotation_y=b3d[:, 6],
                    score=b3d[:, 7],
                )
            )

    summary, ap = kitti_eval(
        gt_annos, det_annos, ("Car",), eval_types=("bbox", "bev", "3d")
    )
    return summary, ap


@pytest.fixture(scope="module")
def eval_all(trained):
    """All-slot evaluation of the trained model, shared by the AP tests."""
    cfg, state, batches, _ = trained
    return _eval_trained(cfg, state, batches)


def test_trained_model_scores_nontrivial_kitti_ap(eval_all):
    summary, ap = eval_all
    print(summary)
    print({k: round(v, 2) for k, v in ap.items() if "moderate" in k})
    # 24 valid GT cap AP at 60 (see N_SCENES note). Memorized scenes:
    # 2D detection must be near the ceiling, 3D localization clearly
    # non-trivial under the official protocol. Tracked results of the
    # trained nano model (printed above): bbox_0.70_mod ~49, 3d_0.50_mod
    # ~41, bev_0.50_mod ~41. Bars sit ~8 AP under that, so a ~20%
    # relative 3D-quality regression fails while run-to-run trainer
    # jitter (the early-stop window, MC draws) does not.
    assert ap["Car_bbox_0.70_moderate"] > 45.0, ap
    assert ap["Car_3d_0.50_moderate"] > 33.0, ap
    assert ap["Car_bev_0.50_moderate"] > 33.0, ap


def test_head_slot_bucketing_preserves_ap(trained, eval_all):
    """test.head_slots caps the 3D heads to the top-K 2D-score slots
    (models/detector.py). Scenes hold <= 2 objects per image, so K=4
    covers every real detection: bbox AP may move only marginally (the
    evaluated detections carry the 2D x 3D fused score and validity, so
    dropping tail slots removes low-score FPs when the memorizer emits
    more than K above-threshold detections on a scene — observed shifts
    ~0.1 AP) and the 3D/BEV APs must agree with the all-slot run within
    a tolerance covering MC-dropout draw differences (the rng fans out
    over (B*K,) slots, so the sample noise differs; the protocol itself
    quantizes at ~2.5 AP per rank)."""
    cfg, state, batches, _ = trained
    _, ap_all = eval_all
    cfg_b = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, head_slots=4)
    )
    _, ap = _eval_trained(cfg_b, state, batches)
    assert ap["Car_bbox_0.70_moderate"] == pytest.approx(
        ap_all["Car_bbox_0.70_moderate"], abs=1.0
    ), (ap, ap_all)
    for key in ("Car_3d_0.50_moderate", "Car_bev_0.50_moderate"):
        assert ap[key] == pytest.approx(ap_all[key], abs=8.0), (
            key, ap[key], ap_all[key]
        )
        assert ap[key] > 33.0, (key, ap)


CROWD_HW = (96, 384)   # wider canvas: 6 objects at training-range depth
                       # without the overlap the nano RPN can't separate


def test_head_slot_truncation_on_crowded_scene(trained):
    """The documented head_slots drop mode, actually exercised: a scene
    with MORE above-threshold detections than head_slots. The bucketed
    run must (a) keep the 2D outputs untouched (full max_per_img slots),
    (b) report zero 3D boxes / identity pose_cov / valid=False beyond
    slot K, and (c) spend its K slots on the highest-2D-score detections
    (NMS slots are score-sorted). docs/COVERAGE.md documents this as the
    one behavioral difference vs all-slot computation."""
    from monorun_tpu.apis.inference import InferenceSession

    cfg, state, _, _ = trained
    crowd = synthetic_scene_batch(
        cfg, B, CROWD_HW, num_gt=8, num_pts=64, seed=77, n_objects=6,
        z_range=(4.5, 7.0), u_span=(0.08, 0.92),
    )
    assert crowd["gt_valid"].sum(axis=1).max() >= 5, (
        "crowd fixture failed to rasterize enough objects"
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    K = 3
    cfg_all = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, head_slots=0)
    )
    cfg_k = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, head_slots=K)
    )
    det_all = InferenceSession(cfg_all, variables, batch_size=B).run(
        crowd["images"], crowd["cam"], crowd["img_shapes"], seed=9
    )
    det_k = InferenceSession(cfg_k, variables, batch_size=B).run(
        crowd["images"], crowd["cam"], crowd["img_shapes"], seed=9
    )

    n_all = np.asarray(det_all.valid).sum(axis=1)
    print("crowded-scene valid detections per image (all-slot):", n_all)
    assert (n_all > K).any(), (
        "crowd premise failed: all-slot run found <= K detections"
    )

    # (a) 2D path identical regardless of head_slots
    np.testing.assert_allclose(
        np.asarray(det_k.bboxes_2d), np.asarray(det_all.bboxes_2d)
    )
    np.testing.assert_allclose(
        np.asarray(det_k.scores_2d), np.asarray(det_all.scores_2d)
    )

    # (b) the tail is cleanly truncated
    valid_k = np.asarray(det_k.valid)
    assert not valid_k[:, K:].any()
    np.testing.assert_array_equal(
        np.asarray(det_k.bboxes_3d)[:, K:], 0.0
    )
    np.testing.assert_array_equal(
        np.asarray(det_k.pose_cov)[:, K:],
        np.broadcast_to(np.eye(4, dtype=np.float32),
                        np.asarray(det_k.pose_cov)[:, K:].shape),
    )

    # (c) the K head slots are the top-K 2D-score slots, and at least one
    # real detection was dropped on the crowded image
    scores_2d = np.asarray(det_all.scores_2d)
    for i in range(B):
        order_ok = np.all(np.diff(scores_2d[i]) <= 1e-6)
        assert order_ok, scores_2d[i]
    dropped = np.asarray(det_all.valid)[:, K:].sum()
    assert dropped > 0


def test_proposal_cut_preserves_ap(trained, eval_all):
    """AP guard for the kitti_multiclass_fast PROPOSAL cut at UNCHANGED
    bars: the flagship 1000 -> 512 RPN cut is mirrored proportionally
    (nano 48 -> 24) on the trained model with the official evaluator.
    With <= 2 objects per image, 24 NMS'd proposals must lose nothing."""
    cfg, state, batches, _ = trained
    _, ap_all = eval_all
    cfg_cut = dataclasses.replace(
        cfg,
        test=dataclasses.replace(
            cfg.test, rpn_nms_pre=24, rpn_nms_post=24
        ),
    )
    _, ap = _eval_trained(cfg_cut, state, batches)
    print({k: round(v, 2) for k, v in ap.items() if "moderate" in k})
    assert ap["Car_bbox_0.70_moderate"] > 45.0, (ap, ap_all)
    assert ap["Car_3d_0.50_moderate"] > 33.0, (ap, ap_all)
    assert ap["Car_bev_0.50_moderate"] > 33.0, (ap, ap_all)


def test_resolution_path_yields_valid_3d(trained):
    """End-to-end guard for the kitti_multiclass_fast 0.75x RESOLUTION
    path: scenes are RENDERED at 4/3 canvas (the generator ties
    intrinsics to canvas height, so K scales exactly 4/3 and the drawn
    poses are identical to the training scenes) and pushed through the
    0.75x serving path (_scale_batch: resize + intrinsics scale +
    2D-box back-mapping). Any scale/offset bug in that plumbing destroys
    the PnP geometry (3d@0.5 -> ~0); what survives the bars below is
    only resampling blur.

    The bars are deliberately LENIENT (measured: bbox ~17, 3d@0.5 ~24
    vs native 49/41): the nano model memorizes 12 point-sampled
    noise-texture scenes, so antialiased resampling is far outside its
    training distribution in a way real-KITTI models are not. This test
    pins plumbing correctness; the true AP cost of the resolution cut
    on real data must be measured with tools/parity.py per README
    'Fast presets' (a direct 0.75x eval of the native scenes scores ~3
    AP, i.e. the memorizer itself is the bottleneck, not the cut)."""
    cfg, state, _, _ = trained
    big = [
        synthetic_scene_batch(
            cfg, B, (HW[0] * 4 // 3, HW[1] * 4 // 3), num_gt=4,
            num_pts=256, seed=40 + i, n_objects=2,
        )
        for i in range(N_SCENES)
    ]
    _, ap = _eval_trained(cfg, state, big, scale=0.75)
    print({k: round(v, 2) for k, v in ap.items() if "moderate" in k})
    assert ap["Car_bbox_0.70_moderate"] > 12.0, ap
    assert ap["Car_3d_0.50_moderate"] > 15.0, ap
    assert ap["Car_bev_0.50_moderate"] > 15.0, ap


def test_fast2_architecture_trains_and_scores():
    """AP guard for the kitti_multiclass_fast2 STRUCTURAL cuts: the
    14x14 dense maps (no CARAFE upsample, 196-point PnP) change the NOC
    decoder function, so unlike the proposal/resolution cuts this rung
    cannot reuse the flagship-trained weights — it implies retraining.
    Mirror the structural cut on the nano model (dense_size 14,
    head_slots at half the detection slots; MC samples stay at the nano
    baseline 4 — the flagship 50->16 MC cut is a pure sample-count
    change of an unbiased estimator, benchmarked at flagship scale),
    train it on the same synthetic scenes, and require non-trivial AP
    through the full serving path + official evaluator.

    Bars are LENIENT on the 3D metrics for the same reason as the
    resolution guard above: the nano memorizer of 12 noise-texture
    scenes amplifies any information cut far beyond what a real-KITTI
    model sees (measured here: bbox 52.5 / bev@0.5 20.8 / 3d@0.5 8.2 vs
    native ~49/33/41). A plumbing bug in the skip-CARAFE path or the
    196-point PnP zeroes 3d AP outright; degraded-but-consistent
    geometry does not. The true AP cost of dense_size=14 must be
    measured by retraining on real KITTI per README 'Fast presets'."""
    cfg = nano_config()
    cfg = dataclasses.replace(
        cfg,
        noc_head=dataclasses.replace(cfg.noc_head, dense_size=14),
        train=dataclasses.replace(cfg.train, dense_size=14),
        test=dataclasses.replace(cfg.test, head_slots=4),
    )
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(2), total_steps=N_STEPS, image_shape=HW
    )
    batches = [
        synthetic_scene_batch(
            cfg, B, HW, num_gt=4, num_pts=256, seed=40 + i, n_objects=2
        )
        for i in range(N_SCENES)
    ]
    jbatches = [jax.tree.map(jnp.asarray, b) for b in batches]
    step = jax.jit(lambda s, b, r: train_step(model, tx, s, b, r))
    hist: dict = {}
    for i in range(N_STEPS):
        state, metrics = step(
            state, jbatches[i % N_SCENES], jax.random.PRNGKey(7000 + i)
        )
        for k, v in metrics.items():
            hist.setdefault(k, []).append(float(v))
        if i >= 240 and np.mean(hist["mean_iou"][-12:]) > 0.55:
            break
    assert max(hist["nonfinite_grad_leaves"]) == 0
    assert float(np.mean(hist["mean_iou"][-8:])) > 0.25, (
        hist["mean_iou"][-10:]
    )
    _, ap = _eval_trained(cfg, state, batches)
    print({k: round(v, 2) for k, v in ap.items() if "moderate" in k})
    assert ap["Car_bbox_0.70_moderate"] > 40.0, ap
    assert ap["Car_3d_0.50_moderate"] > 5.0, ap
    assert ap["Car_bev_0.50_moderate"] > 12.0, ap
