import jax
import jax.numpy as jnp
import numpy as np

from monorun_tpu.ops.nms import (
    NEG_INF,
    bbox_iou_matrix,
    multiclass_nms,
    nms,
    nms_rotated_bev,
)


def _greedy_np(boxes, scores, thr):
    """Plain python greedy NMS for golden comparison."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i] or scores[i] <= NEG_INF / 2:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            ax1, ay1, ax2, ay2 = boxes[i]
            bx1, by1, bx2, by2 = boxes[j]
            iw = max(0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            union = (
                (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
            )
            if inter / max(union, 1e-8) > thr:
                suppressed[j] = True
    return keep


def _random_boxes(n, seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_nms_exact_matches_greedy():
    boxes, scores = _random_boxes(64, 0)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 64)
    got = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
    expect = _greedy_np(boxes, scores, 0.5)
    assert got == expect


def test_nms_fixpoint_matches_greedy():
    boxes, scores = _random_boxes(96, 1)
    idx, valid = nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.7, 96, exact=False
    )
    got = sorted(int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v)
    expect = sorted(_greedy_np(boxes, scores, 0.7))
    assert got == expect


def test_nms_respects_padding():
    boxes, scores = _random_boxes(16, 2)
    scores[8:] = NEG_INF
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 16)
    kept = np.asarray(idx)[np.asarray(valid)]
    assert (kept < 8).all()


def test_nms_max_out_truncates():
    boxes, scores = _random_boxes(32, 3)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.99, 5)
    assert idx.shape == (5,)
    assert np.asarray(valid).sum() == 5  # high thr keeps everything


def test_rotated_nms_suppresses_duplicates():
    boxes = np.array(
        [
            [0.0, 0.0, 4.0, 2.0, 0.3],
            [0.05, 0.0, 4.0, 2.0, 0.3],   # near-duplicate
            [10.0, 10.0, 4.0, 2.0, 1.0],
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, valid = nms_rotated_bev(
        jnp.asarray(boxes), jnp.asarray(scores), 0.1, 3
    )
    kept = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == [0, 2]


def test_multiclass_nms_separates_classes():
    # same box, two classes: both survive (offset trick keeps classes apart)
    boxes = np.tile(np.array([[10, 10, 30, 30]], np.float32), (2, 1))
    scores = np.full((2, 3), NEG_INF, np.float32)
    scores[0, 0] = 0.9
    scores[1, 1] = 0.8
    det_boxes, det_scores, det_labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 4
    )
    v = np.asarray(valid)
    assert v.sum() == 2
    labels = sorted(np.asarray(det_labels)[v].tolist())
    assert labels == [0, 1]


def test_multiclass_nms_within_class_suppression():
    boxes = np.array(
        [[10, 10, 30, 30], [11, 11, 31, 31], [60, 60, 80, 80]], np.float32
    )
    scores = np.full((3, 2), NEG_INF, np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.85  # overlaps box 0, same class -> suppressed
    scores[2, 0] = 0.7
    _, det_scores, det_labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 4
    )
    assert np.asarray(valid).sum() == 2


def test_iou_matrix_basic():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[5.0, 0, 15, 10]])
    np.testing.assert_allclose(
        np.asarray(bbox_iou_matrix(a, b)), [[50.0 / 150.0]], rtol=1e-6
    )


def test_fixpoint_full_depth_chain_is_exact():
    """Adversarial suppression chain deeper than the old 12-iteration
    bound: boxes in a line where each overlaps only its neighbours, so
    greedy keeps alternating boxes and the fixpoint needs ~chain-depth
    applications. With fixpoint_iters >= n the fixpoint must equal the
    exact greedy set (the serving path passes its head-slot count)."""
    import jax.numpy as jnp
    import numpy as np

    from monorun_tpu.ops.nms import nms_rotated_bev

    n = 48
    # BEV boxes [x, z, l, w, ry] spaced so IoU(i, i+1) ~ 1/3 > thr and
    # IoU(i, i+2) = 0; descending scores form a maximal-depth chain
    boxes = np.zeros((n, 5), np.float32)
    boxes[:, 0] = np.arange(n) * 1.0      # x centers, spacing 1
    boxes[:, 2] = 2.0                     # l (x extent)
    boxes[:, 3] = 1.0                     # w
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    thr = 0.2

    idx_e, v_e = nms_rotated_bev(
        jnp.asarray(boxes), jnp.asarray(scores), thr, n, exact=True
    )
    kept_exact = np.zeros(n, bool)
    kept_exact[np.asarray(idx_e)[np.asarray(v_e)]] = True
    # greedy on this chain keeps exactly the even indices
    assert kept_exact.tolist() == [i % 2 == 0 for i in range(n)]

    idx_12, v_12 = nms_rotated_bev(
        jnp.asarray(boxes), jnp.asarray(scores), thr, n, exact=False,
        fixpoint_iters=12,
    )
    kept_12 = np.zeros(n, bool)
    kept_12[np.asarray(idx_12)[np.asarray(v_12)]] = True
    # the old fixed bound is only an UPPER bound on deep chains
    assert kept_12.sum() >= kept_exact.sum()

    idx_f, v_f = nms_rotated_bev(
        jnp.asarray(boxes), jnp.asarray(scores), thr, n, exact=False,
        fixpoint_iters=n,
    )
    kept_f = np.zeros(n, bool)
    kept_f[np.asarray(idx_f)[np.asarray(v_f)]] = True
    assert kept_f.tolist() == kept_exact.tolist()
