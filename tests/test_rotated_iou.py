import cv2
import jax.numpy as jnp
import numpy as np

from monorun_tpu.ops.rotated_iou import (
    bbox3d_overlaps,
    bbox3d_overlaps_aligned,
    box_corners,
    dimonly_iou_aligned,
    rotated_iou,
    rotated_iou_aligned,
)


def _cv2_inter_area(box_a, box_b):
    """Golden intersection area via cv2 convex polygon intersection."""
    ca = np.asarray(box_corners(jnp.asarray(box_a)[None])[0], np.float32)
    cb = np.asarray(box_corners(jnp.asarray(box_b)[None])[0], np.float32)
    area, _ = cv2.intersectConvexConvex(ca, cb)
    return float(area)


def test_corners_axis_aligned():
    c = np.asarray(box_corners(jnp.asarray([[1.0, 2.0, 4.0, 2.0, 0.0]])))[0]
    expect = {(-1.0, 1.0), (-1.0, 3.0), (3.0, 3.0), (3.0, 1.0)}
    got = {tuple(np.round(p, 5)) for p in c}
    assert got == expect


def test_identical_boxes_iou_one():
    boxes = jnp.asarray([[0.0, 0.0, 2.0, 3.0, 0.7]])
    iou = rotated_iou_aligned(boxes, boxes)
    np.testing.assert_allclose(np.asarray(iou), [1.0], atol=1e-5)


def test_disjoint_boxes_iou_zero():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b = jnp.asarray([[10.0, 10.0, 2.0, 2.0, 1.0]])
    np.testing.assert_allclose(np.asarray(rotated_iou_aligned(a, b)), [0.0])


def test_axis_aligned_overlap_analytic():
    # two unit squares offset by 0.5 in x: inter = 0.5, union = 1.5
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.5, 0.0, 1.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(rotated_iou_aligned(a, b)), [0.5 / 1.5], atol=1e-5
    )


def test_rotated_square_45_analytic():
    # unit square vs itself rotated 45deg: intersection is a regular
    # octagon with area 2*(sqrt(2)-1)
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)
    iou = inter / (2 - inter)
    np.testing.assert_allclose(
        np.asarray(rotated_iou_aligned(a, b)), [iou], atol=1e-4
    )


def test_random_pairs_match_cv2():
    rng = np.random.default_rng(0)
    n = 40
    boxes_a = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
         rng.uniform(0.5, 4, n), rng.uniform(0.5, 4, n),
         rng.uniform(-np.pi, np.pi, n)], -1,
    ).astype(np.float32)
    boxes_b = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
         rng.uniform(0.5, 4, n), rng.uniform(0.5, 4, n),
         rng.uniform(-np.pi, np.pi, n)], -1,
    ).astype(np.float32)
    got = np.asarray(rotated_iou_aligned(
        jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    for i in range(n):
        inter = _cv2_inter_area(boxes_a[i], boxes_b[i])
        area_a = boxes_a[i, 2] * boxes_a[i, 3]
        area_b = boxes_b[i, 2] * boxes_b[i, 3]
        expect = inter / max(area_a + area_b - inter, 1e-8)
        assert abs(got[i] - expect) < 2e-3, (i, got[i], expect)


def test_pairwise_matrix_consistent_with_aligned():
    rng = np.random.default_rng(1)
    a = rng.uniform(-2, 2, (5, 5)).astype(np.float32)
    a[:, 2:4] = np.abs(a[:, 2:4]) + 0.5
    m = np.asarray(rotated_iou(jnp.asarray(a), jnp.asarray(a)))
    d = np.asarray(rotated_iou_aligned(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(m), d, atol=1e-5)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
    np.testing.assert_allclose(m, m.T, atol=1e-4)


def test_bbox3d_aligned_identical_and_shifted():
    # [x, y, z, l, h, w, ry], y down, bottom origin
    box = jnp.asarray([[1.0, 1.5, 10.0, 4.0, 1.5, 1.8, 0.3]])
    np.testing.assert_allclose(
        np.asarray(bbox3d_overlaps_aligned(box, box)), [1.0], atol=1e-5
    )
    # shift y by half height: height overlap = h/2 -> iou = 0.5/1.5
    shifted = box.at[0, 1].add(0.75)
    np.testing.assert_allclose(
        np.asarray(bbox3d_overlaps_aligned(box, shifted)),
        [(0.75 / 1.5) / (2 - 0.75 / 1.5)], atol=1e-4,
    )


def test_bbox3d_pairwise_shape():
    rng = np.random.default_rng(2)
    a = rng.uniform(0.5, 2, (3, 7)).astype(np.float32)
    b = rng.uniform(0.5, 2, (4, 7)).astype(np.float32)
    m = bbox3d_overlaps(jnp.asarray(a), jnp.asarray(b))
    assert m.shape == (3, 4)
    assert (np.asarray(m) >= 0).all() and (np.asarray(m) <= 1).all()


def test_dimonly_iou():
    d1 = jnp.asarray([[2.0, 2.0, 2.0]])
    d2 = jnp.asarray([[1.0, 2.0, 2.0]])
    np.testing.assert_allclose(
        np.asarray(dimonly_iou_aligned(d1, d2)), [0.5], atol=1e-6
    )
