"""Geometry kernel tests: device clipping/hull/IoU vs independent references.

The reference repo validated its clipping only visually
(reference: src/utils/cal_intersection_rotated_boxes.py:99-171,
src/utils/iou_rotated_boxes_utils.py:145-216, shapely vs custom, drawn with
cv2). Here the device kernels are checked numerically against (a) analytic
cases, (b) cv2-rasterized polygon IoU on a fine grid, (c) scipy ConvexHull
areas, and (d) finite differences for the gradient path.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import ConvexHull

from complex_yolov4_tpu.ops import rotated_boxes as rb


def np_corners(box):
    x, y, w, l, yaw = box
    c, s = np.cos(yaw), np.sin(yaw)
    pts = []
    for sw, sl in ((-1, 1), (-1, -1), (1, -1), (1, 1)):
        pts.append([x + sw * w / 2 * c - sl * l / 2 * s,
                    y + sw * w / 2 * s + sl * l / 2 * c])
    return np.array(pts, np.float64)


def raster_iou(b1, b2, scale=50):
    """Rasterized IoU on a fine grid — slow but assumption-free."""
    c1, c2 = np_corners(b1), np_corners(b2)
    allpts = np.vstack([c1, c2])
    lo = allpts.min(0) - 1
    size = (allpts.max(0) - lo + 2)
    w, h = int(size[0] * scale), int(size[1] * scale)
    img1 = np.zeros((h, w), np.uint8)
    img2 = np.zeros((h, w), np.uint8)
    cv2.fillPoly(img1, [np.round((c1 - lo) * scale).astype(np.int32)], 1)
    cv2.fillPoly(img2, [np.round((c2 - lo) * scale).astype(np.int32)], 1)
    inter = np.logical_and(img1, img2).sum()
    union = np.logical_or(img1, img2).sum()
    return inter / max(union, 1)


def rand_boxes(rng, n, center=10.0, spread=6.0):
    return np.stack([
        rng.uniform(center - spread, center + spread, n),
        rng.uniform(center - spread, center + spread, n),
        rng.uniform(1.0, 8.0, n),
        rng.uniform(1.0, 8.0, n),
        rng.uniform(-2 * np.pi, 2 * np.pi, n),
    ], axis=-1).astype(np.float32)


def test_corners_match_reference_convention():
    box = np.array([3.0, 4.0, 2.0, 6.0, 0.7], np.float32)
    got = np.asarray(rb.box_corners(jnp.asarray(box)))
    np.testing.assert_allclose(got, np_corners(box), rtol=1e-5, atol=1e-5)


def test_identical_boxes_iou_one():
    b = jnp.asarray([[5.0, 5.0, 2.0, 4.0, 0.3]] * 3)
    iou = rb.rotated_iou(b, b)
    np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-5)


def test_disjoint_boxes_iou_zero():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.5]])
    b2 = jnp.asarray([[100.0, 100.0, 2.0, 2.0, 1.0]])
    assert float(rb.rotated_iou(b1, b2)[0]) == pytest.approx(0.0, abs=1e-6)


def test_axis_aligned_analytic():
    # 4x4 at origin vs 4x4 shifted by (2, 0): inter 8, union 24.
    b1 = jnp.asarray([[0.0, 0.0, 4.0, 4.0, 0.0]])
    b2 = jnp.asarray([[2.0, 0.0, 4.0, 4.0, 0.0]])
    assert float(rb.rotated_iou(b1, b2)[0]) == pytest.approx(8 / 24, abs=1e-5)


def test_rotated_45_analytic():
    # Unit square vs same square rotated 45 deg: octagon inter = 2(sqrt2 - 1).
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = float(rb.intersection_area(b1, b2)[0])
    assert inter == pytest.approx(2 * (np.sqrt(2) - 1), abs=1e-5)


def test_contained_box():
    b1 = jnp.asarray([[0.0, 0.0, 10.0, 10.0, 0.2]])
    b2 = jnp.asarray([[0.0, 0.0, 2.0, 3.0, 1.1]])
    assert float(rb.intersection_area(b1, b2)[0]) == pytest.approx(6.0, abs=1e-4)
    assert float(rb.rotated_iou(b1, b2)[0]) == pytest.approx(6.0 / 100.0, abs=1e-5)


def test_random_vs_rasterized():
    rng = np.random.RandomState(7)
    n = 24
    b1 = rand_boxes(rng, n)
    b2 = rand_boxes(rng, n)
    iou = np.asarray(rb.rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(n):
        ref = raster_iou(b1[i], b2[i])
        assert iou[i] == pytest.approx(ref, abs=0.02), f"pair {i}: {b1[i]} {b2[i]}"


def test_pairwise_matches_elementwise():
    rng = np.random.RandomState(3)
    b1, b2 = rand_boxes(rng, 5), rand_boxes(rng, 7)
    mat = np.asarray(rb.pairwise_rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
    for i in range(5):
        for j in range(7):
            single = float(rb.rotated_iou(jnp.asarray(b1[i : i + 1]), jnp.asarray(b2[j : j + 1]))[0])
            assert mat[i, j] == pytest.approx(single, abs=1e-5)


def test_hull_area_vs_scipy():
    rng = np.random.RandomState(11)
    b1 = rand_boxes(rng, 32)
    b2 = rand_boxes(rng, 32)
    c = np.concatenate([
        np.stack([np_corners(b) for b in b1]),
        np.stack([np_corners(b) for b in b2]),
    ], axis=1)  # (32, 8, 2)
    got = np.asarray(jax.vmap(rb._hull_area_8)(jnp.asarray(c, jnp.float32)))
    for i in range(32):
        ref = ConvexHull(c[i]).volume  # 2-D "volume" is the area
        assert got[i] == pytest.approx(ref, rel=1e-4), f"case {i}"


def test_hull_area_degenerate_sets():
    """Maximal-edge hull: duplicates collapse to one representative,
    collinear sets cancel to zero area, and coincident-corner unions
    (degenerate padded boxes) stay exact."""
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], np.float32)
    # all 8 points = square corners duplicated -> area 4
    pts = np.concatenate([sq, sq], axis=0)
    assert float(rb._hull_area_8(jnp.asarray(pts))) == pytest.approx(4.0, abs=1e-5)
    # degenerate box (w=l=0): 4 identical corners + square -> still 4
    dup = np.tile(np.array([[1.0, 1.0]], np.float32), (4, 1))
    pts = np.concatenate([sq, dup], axis=0)
    assert float(rb._hull_area_8(jnp.asarray(pts))) == pytest.approx(4.0, abs=1e-5)
    # all points on one line -> area 0
    line = np.stack([np.linspace(0, 7, 8), np.linspace(0, 14, 8)],
                    axis=1).astype(np.float32)
    assert float(rb._hull_area_8(jnp.asarray(line))) == pytest.approx(0.0, abs=1e-5)
    # collinear midpoint on a hull edge must not double-count
    tri = np.array([[0, 0], [4, 0], [2, 0], [2, 3]], np.float32)
    pts = np.concatenate([tri, tri], axis=0)
    assert float(rb._hull_area_8(jnp.asarray(pts))) == pytest.approx(6.0, abs=1e-4)


def test_giou_bounds_and_degenerate():
    rng = np.random.RandomState(5)
    b1, b2 = rand_boxes(rng, 40), rand_boxes(rng, 40)
    giou, iou = rb.rotated_giou(jnp.asarray(b1), jnp.asarray(b2))
    giou, iou = np.asarray(giou), np.asarray(iou)
    assert np.all(giou <= iou + 1e-5)
    assert np.all(giou >= -1 - 1e-5) and np.all(giou <= 1 + 1e-5)
    # identical boxes: giou == iou == 1
    g, i = rb.rotated_giou(jnp.asarray(b1), jnp.asarray(b1))
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i), 1.0, atol=1e-4)


def test_intersection_gradient_finite_diff():
    """Intersection area must be differentiable (GIoU loss path)."""
    b1 = jnp.asarray([1.0, 0.5, 4.0, 3.0, 0.4])
    b2 = jnp.asarray([2.0, 1.0, 3.0, 5.0, -0.3])

    f = lambda a: rb.intersection_area(a[None], b2[None])[0]
    grad = np.asarray(jax.grad(f)(b1))
    assert np.all(np.isfinite(grad))
    eps = 1e-3
    for k in range(5):
        d = np.zeros(5, np.float32)
        d[k] = eps
        num = (float(f(b1 + d)) - float(f(b1 - d))) / (2 * eps)
        assert grad[k] == pytest.approx(num, abs=5e-2), f"coord {k}"


def test_giou_gradient_finite():
    rng = np.random.RandomState(9)
    b1, b2 = rand_boxes(rng, 8), rand_boxes(rng, 8)
    loss = lambda a: jnp.sum(1.0 - rb.rotated_giou(a, jnp.asarray(b2))[0])
    g = np.asarray(jax.grad(loss)(jnp.asarray(b1)))
    assert np.all(np.isfinite(g))
    assert np.any(g != 0)


def test_jit_and_batch_shapes():
    rng = np.random.RandomState(1)
    b1 = jnp.asarray(rand_boxes(rng, 6)).reshape(2, 3, 5)
    b2 = jnp.asarray(rand_boxes(rng, 6)).reshape(2, 3, 5)
    out = jax.jit(rb.rotated_iou)(b1, b2)
    assert out.shape == (2, 3)
    g = jax.jit(lambda a, b: rb.rotated_giou(a, b)[0])(b1, b2)
    assert g.shape == (2, 3)


def test_iou_invariance_properties():
    """Fuzz: IoU is symmetric and invariant under rigid transforms."""
    rng = np.random.RandomState(13)
    b1 = rand_boxes(rng, 32)
    b2 = rand_boxes(rng, 32)
    iou_ab = np.asarray(rb.rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
    iou_ba = np.asarray(rb.rotated_iou(jnp.asarray(b2), jnp.asarray(b1)))
    np.testing.assert_allclose(iou_ab, iou_ba, atol=1e-5)

    # translation invariance
    t = np.array([7.3, -2.1, 0, 0, 0], np.float32)
    iou_t = np.asarray(rb.rotated_iou(jnp.asarray(b1 + t), jnp.asarray(b2 + t)))
    np.testing.assert_allclose(iou_ab, iou_t, atol=1e-4)

    # common rotation about the origin
    ang = 0.83
    def rot(b):
        out = b.copy()
        c, s = np.cos(ang), np.sin(ang)
        out[:, 0] = b[:, 0] * c - b[:, 1] * s
        out[:, 1] = b[:, 0] * s + b[:, 1] * c
        out[:, 4] = b[:, 4] + ang
        return out
    iou_r = np.asarray(rb.rotated_iou(jnp.asarray(rot(b1)), jnp.asarray(rot(b2))))
    np.testing.assert_allclose(iou_ab, iou_r, atol=1e-3)

    # yaw periodicity (boxes are 180-degree symmetric rectangles)
    b1p = b1.copy(); b1p[:, 4] += np.pi
    iou_p = np.asarray(rb.rotated_iou(jnp.asarray(b1p), jnp.asarray(b2)))
    np.testing.assert_allclose(iou_ab, iou_p, atol=1e-4)


def test_intersection_bounds_fuzz():
    """Fuzz: 0 <= inter <= min(area1, area2); IoU in [0, 1]."""
    rng = np.random.RandomState(17)
    for seed in range(3):
        r = np.random.RandomState(seed)
        b1 = rand_boxes(r, 128, spread=10.0)
        b2 = rand_boxes(r, 128, spread=10.0)
        inter = np.asarray(rb.intersection_area(jnp.asarray(b1), jnp.asarray(b2)))
        a1 = b1[:, 2] * b1[:, 3]
        a2 = b2[:, 2] * b2[:, 3]
        assert np.all(inter >= -1e-4)
        assert np.all(inter <= np.minimum(a1, a2) * (1 + 1e-4) + 1e-4)
        iou = np.asarray(rb.rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
        assert np.all(iou >= -1e-6) and np.all(iou <= 1 + 1e-5)


def test_degenerate_thin_boxes():
    """Near-zero width boxes: finite results, ~zero IoU."""
    b1 = jnp.asarray([[10.0, 10.0, 1e-4, 5.0, 0.7]])
    b2 = jnp.asarray([[10.0, 10.0, 4.0, 4.0, 0.0]])
    iou = float(rb.rotated_iou(b1, b2)[0])
    assert np.isfinite(iou) and 0 <= iou < 1e-3
    g, i = rb.rotated_giou(b1, b2)
    assert np.isfinite(float(g[0]))
