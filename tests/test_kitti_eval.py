"""KITTI AP protocol tests on constructed scenarios with known outcomes."""

import numpy as np

from monorun_tpu.eval.kitti_eval import (

    clean_data,
    get_thresholds,
    kitti_eval,
)

import pytest

pytestmark = pytest.mark.smoke  # seconds-fast numeric core


def _gt(names, bboxes, locs=None, dims=None, rys=None, trunc=None, occ=None):
    n = len(names)
    return dict(
        name=np.asarray(names),
        truncated=np.asarray(trunc if trunc is not None else [0.0] * n),
        occluded=np.asarray(occ if occ is not None else [0] * n),
        alpha=np.zeros(n),
        bbox=np.asarray(bboxes, np.float32).reshape(n, 4),
        dimensions=np.asarray(
            dims if dims is not None else [[4, 1.5, 1.7]] * n, np.float32
        ).reshape(n, 3),
        location=np.asarray(
            locs if locs is not None else [[0, 1.5, 20]] * n, np.float32
        ).reshape(n, 3),
        rotation_y=np.asarray(rys if rys is not None else [0.0] * n),
        score=np.zeros(n, np.float32),
    )


def _dt(bboxes, scores, locs=None, dims=None, rys=None, name="Car"):
    n = len(scores)
    a = _gt([name] * n, bboxes, locs, dims, rys)
    a["score"] = np.asarray(scores, np.float32)
    a["alpha"] = np.zeros(n)
    return a


BOX = [100, 100, 200, 200]  # height 100 > easy min height 40
N_IMG = 50  # enough distinct score levels to populate all 41 recall points


def _scores(i, base=0.9):
    return base - 0.004 * i



def test_perfect_detection_gives_100():
    gts = [_gt(["Car"], [BOX])] * N_IMG
    dts = [_dt([BOX], [_scores(i)]) for i in range(N_IMG)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["bbox"])
    assert ap["Car_bbox_0.70_easy"] > 97.0
    assert ap["Car_bbox_0.70_moderate"] > 97.0


def test_missed_half_reduces_recall():
    # 2 GTs per image, only 1 detected
    gts = [_gt(["Car", "Car"], [BOX, [300, 100, 400, 200]])] * N_IMG
    dts = [_dt([BOX], [_scores(i)]) for i in range(N_IMG)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["bbox"])
    # R40: precision 1 up to recall 0.5, 0 beyond -> AP ~ 50
    assert 40.0 < ap["Car_bbox_0.70_easy"] <= 52.0


def test_false_positive_hurts_precision():
    gts = [_gt(["Car"], [BOX])] * N_IMG
    dts = [_dt([BOX, [500, 100, 600, 200]], [_scores(i), _scores(i, 0.89)])
           for i in range(N_IMG)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["bbox"])
    assert ap["Car_bbox_0.70_easy"] < 90.0


def test_dontcare_region_not_a_false_positive():
    gts = [_gt(["Car", "DontCare"], [BOX, [500, 100, 600, 200]])] * N_IMG
    dts = [_dt([BOX, [500, 100, 600, 200]], [_scores(i), _scores(i, 0.89)])
           for i in range(N_IMG)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["bbox"])
    assert ap["Car_bbox_0.70_easy"] > 97.0


def test_van_ignored_for_car():
    # detection on a Van: assigned to the ignored GT, neither TP nor FP
    gts = [_gt(["Car", "Van"], [BOX, [500, 100, 600, 200]])] * N_IMG
    dts = [_dt([BOX, [500, 100, 600, 200]], [_scores(i), _scores(i, 0.89)])
           for i in range(N_IMG)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["bbox"])
    assert ap["Car_bbox_0.70_easy"] > 97.0


def test_difficulty_filtering():
    # small box (height 30 < 40) doesn't count for easy but does moderate
    small = [100, 100, 160, 130]
    gts = [_gt(["Car"], [small])] * N_IMG
    dts = [_dt([small], [_scores(i)]) for i in range(N_IMG)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["bbox"])
    assert ap["Car_bbox_0.70_moderate"] > 97.0
    # easy: zero valid GTs -> AP 0 by convention here
    assert ap["Car_bbox_0.70_easy"] < 1.0


def test_occlusion_truncation_filters():
    n_valid, ig, idt, dc = clean_data(
        _gt(
            ["Car", "Car", "Car"], [BOX, BOX, BOX],
            trunc=[0.0, 0.4, 0.0], occ=[0, 0, 3],
        ),
        _dt([BOX], [0.9]),
        "Car", 1,
    )
    assert n_valid == 1
    assert list(ig) == [0, 1, 1]


def test_3d_metric_exact_match():
    gts = [_gt(["Car"], [BOX], locs=[[1.0, 1.5, 15.0]], rys=[0.3])] * N_IMG
    dts = [_dt([BOX], [_scores(i)], locs=[[1.0, 1.5, 15.0]], rys=[0.3])
           for i in range(N_IMG)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["3d"])
    assert ap["Car_3d_0.70_easy"] > 97.0


def test_3d_metric_offset_fails_strict_passes_loose():
    # x offset 1.0 on an l=4 box: 3D IoU = 3/5 = 0.6 — fails 0.7, passes 0.5
    gts = [_gt(["Car"], [BOX], locs=[[0.0, 1.5, 15.0]], rys=[0.0])] * N_IMG
    dts = [_dt([BOX], [_scores(i)], locs=[[1.0, 1.5, 15.0]], rys=[0.0])
           for i in range(N_IMG)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["3d"])
    assert ap["Car_3d_0.70_easy"] < 1.0
    assert ap["Car_3d_0.50_easy"] > 97.0


def test_get_thresholds_spacing():
    scores = np.linspace(1, 0, 100)
    th = get_thresholds(scores, 100)
    assert len(th) <= 41
    assert (np.diff(th) <= 0).all()


def test_native_matches_python():
    """C++ eval kernels must reproduce the python protocol exactly."""
    from monorun_tpu.eval._native import get_lib
    from monorun_tpu.eval.kitti_eval import eval_class

    if get_lib() is None:
        import pytest

        pytest.skip("native eval library unavailable (no g++?)")

    rng = np.random.default_rng(5)
    gts, dts = [], []
    for i in range(30):
        n_gt = int(rng.integers(1, 5))
        n_dt = int(rng.integers(0, 6))
        boxes_gt = []
        for _ in range(n_gt):
            x, y = rng.uniform(0, 800), rng.uniform(0, 200)
            w, h = rng.uniform(40, 120), rng.uniform(45, 120)
            boxes_gt.append([x, y, x + w, y + h])
        names = rng.choice(["Car", "Van", "DontCare"], n_gt,
                           p=[0.7, 0.15, 0.15])
        gts.append(_gt(list(names), boxes_gt))
        boxes_dt, scores = [], []
        for _ in range(n_dt):
            if n_gt and rng.uniform() < 0.6:
                src = boxes_gt[int(rng.integers(0, n_gt))]
                jit = rng.uniform(-8, 8, 4)
                boxes_dt.append(list(np.asarray(src) + jit))
            else:
                x, y = rng.uniform(0, 800), rng.uniform(0, 200)
                boxes_dt.append([x, y, x + 80, y + 60])
            scores.append(float(rng.uniform(0.1, 1.0)))
        dts.append(_dt(boxes_dt, scores) if n_dt else _dt([], []))

    for metric in (0, 2):
        for diff in (0, 1):
            r_py = eval_class(gts, dts, "Car", diff, metric, 0.5,
                              compute_aos=True, use_native=False)
            r_c = eval_class(gts, dts, "Car", diff, metric, 0.5,
                             compute_aos=True, use_native=True)
            np.testing.assert_allclose(
                r_c["precision"], r_py["precision"], atol=1e-5
            )
            np.testing.assert_allclose(
                r_c["recall"], r_py["recall"], atol=1e-5
            )
            np.testing.assert_allclose(r_c["aos"], r_py["aos"], atol=1e-5)


def test_short_wrong_class_det_is_ignored_not_removed():
    """Reference clean_data (eval.py:67-78) checks height FIRST: a short
    detection of ANY class is code 1 (ignored) — it can absorb a GT during
    matching (no FN, no TP) — never -1 (removed), which would leave the GT
    unmatched (an FN). The two semantics give different FN counts here."""
    from monorun_tpu.eval.kitti_eval import compute_statistics

    short_box = [100, 100, 200, 130]  # height 30 < easy MIN_HEIGHT 40
    gt = _gt(["Car"], [BOX])
    dt = _dt([short_box], [0.9], name="Pedestrian")

    _, ig, idt, dc = clean_data(gt, dt, "Car", 0)
    assert list(ig) == [0]
    assert list(idt) == [1]  # ignored, NOT -1

    # overlaps[dt, gt]: force full overlap so the ignored det can absorb
    overlaps = np.ones((1, 1), np.float32)
    tp, fp, fn, _, _ = compute_statistics(
        overlaps, gt, dt, ig, idt, dc, metric=0, min_overlap=0.5,
        thresh=0.0, compute_fp=True,
    )
    # ignored det absorbs the GT: no TP, no FP, and crucially no FN
    assert (tp, fp, fn) == (0, 0, 0)


def test_aos_similarity_minus_one_when_no_tp_no_fp():
    """Devkit edge case (reference eval.py:276-279): an image with tp == 0
    AND fp == 0 at a threshold contributes similarity = -1 (not 0) to the
    AOS numerator."""
    from monorun_tpu.eval.kitti_eval import compute_statistics

    gt = _gt(["Car"], [BOX])
    dt = _dt([BOX], [0.3])
    _, ig, idt, dc = clean_data(gt, dt, "Car", 0)
    overlaps = np.ones((1, 1), np.float32)
    # threshold above the det score: the det is threshold-ignored -> no
    # TP and no FP -> the sentinel
    tp, fp, fn, sim, _ = compute_statistics(
        overlaps, gt, dt, ig, idt, dc, metric=0, min_overlap=0.5,
        thresh=0.5, compute_fp=True, compute_aos=True,
    )
    assert (tp, fp) == (0, 0)
    assert sim == -1.0
    # below the score: a clean TP with alpha match -> similarity 1.0
    tp, fp, fn, sim, _ = compute_statistics(
        overlaps, gt, dt, ig, idt, dc, metric=0, min_overlap=0.5,
        thresh=0.1, compute_fp=True, compute_aos=True,
    )
    assert tp == 1 and sim == 1.0


def test_aos_empty_images_drag_numerator():
    """End-to-end magnitude of the -1 sentinel: N perfect-alpha images
    plus N empty images (no GT, no DT). Each empty image contributes -1
    to the AOS numerator at every threshold, so at the highest-recall
    threshold the numerator is N - N = 0 and the max-future smoothing
    pins AOS AP to ~0 — while bbox AP stays ~100. (This magnifies the
    devkit rule; without it AOS would equal bbox AP here.)"""
    n = N_IMG  # enough distinct score levels for all 41 recall points
    gts = [_gt(["Car"], [BOX]) for _ in range(n)]
    gts += [_gt([], np.zeros((0, 4))) for _ in range(n)]
    dts = [_dt([BOX], [_scores(i)]) for i in range(n)]
    dts += [_dt([], []) for _ in range(n)]
    _, ap = kitti_eval(gts, dts, ["Car"], eval_types=["bbox"])
    assert ap["Car_bbox_0.70_easy"] > 97.0
    assert ap["Car_aos_0.70_easy"] < 3.0


def test_clean_data_det_codes_matrix():
    """Height-first det coding: short any-class -> 1, tall same-class -> 0,
    tall other-class -> -1 (reference eval.py:67-78)."""
    tall, short = BOX, [300, 100, 400, 130]
    dt = _dt([tall, short, tall, short], [0.9, 0.8, 0.7, 0.6])
    dt["name"] = np.asarray(["Car", "Car", "Pedestrian", "Pedestrian"])
    _, _, idt, _ = clean_data(_gt(["Car"], [BOX]), dt, "Car", 0)
    assert list(idt) == [0, 1, -1, 1]
