"""Rotated-box geometry as vectorized, differentiable XLA ops.

The reference computes rotated-polygon intersection through shapely/GEOS on
CPU with Python loops (reference: src/utils/iou_rotated_boxes_utils.py:82-140)
and its differentiable GIoU path through a per-box torch Sutherland-Hodgman
clip plus a scipy ConvexHull host round-trip
(reference: src/utils/cal_intersection_rotated_boxes.py:42-96,
src/utils/iou_rotated_boxes_utils.py:98-142). Here the same geometry is a
batched, branch-free device kernel.

Quad-quad intersection uses the candidate-point formulation instead of
sequential half-plane clipping: the intersection of two convex quads is a
convex polygon whose vertices are exactly (a) corners of A inside B,
(b) corners of B inside A, and (c) the 16 possible edge-edge crossings —
24 masked candidates, ordered by angle around their centroid and reduced by
the masked shoelace formula. That removes every sequential dependency: one
pass of wide elementwise ops plus a single small sort.

TPU layout note: the pair axis is kept LAST throughout (coordinates as
separate x/y arrays of shape (verts, ..., P)), so every op runs with the
batch in the 128-wide lane dimension. The earlier Sutherland-Hodgman
formulation kept (verts, 2) last and ran at 2/128 lane utilization — this
layout is ~20x faster inside the fused inference program at NMS sizes.

The GIoU enclosing hull uses a branch-free maximal-edge formulation over the
8 corner points (`_hull_area_xy`): an edge is on the hull iff every point is
left-of-or-collinear-within it, and summing cross products over qualifying
directed edges yields the area with no sort, stack, or sequential loop.
Hull *selection* is boolean predicate work (no gradient, matching the
reference's use of ConvexHull vertex indices only) while the area stays
differentiable through the coordinates.

Everything jits once and runs entirely on device for loss, NMS, and eval.

Box layout: (..., 5) = [x, y, w, l, yaw]; corners follow the reference's
convention (reference: src/data_process/kitti_bev_utils.py:99-119) and wind
counter-clockwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry epsilon: boxes live in pixel units (~1..600); small enough not to
# perturb areas, large enough to absorb fp32 noise in inside/parallel tests.
_EPS = 1e-6
_BIG = 1e9


def box_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) [x, y, w, l, yaw] -> (..., 4, 2) corners, counter-ordered
    front-left, rear-left, rear-right, front-right (reference convention,
    src/data_process/kitti_bev_utils.py:99-119)."""
    x, y, w, l, yaw = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    hw, hl = w * 0.5, l * 0.5
    # Signs of (w-axis, l-axis) offsets per corner.
    sw = jnp.asarray([-1.0, -1.0, 1.0, 1.0], boxes.dtype)
    sl = jnp.asarray([1.0, -1.0, -1.0, 1.0], boxes.dtype)
    cx = x[..., None] + sw * hw[..., None] * c[..., None] - sl * hl[..., None] * s[..., None]
    cy = y[..., None] + sw * hw[..., None] * s[..., None] + sl * hl[..., None] * c[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _corners_xy(boxes: jnp.ndarray):
    """(..., 5) boxes -> (cx, cy) each (4, ...) — corner-major, batch last."""
    c = box_corners(boxes)  # (..., 4, 2)
    cx = jnp.moveaxis(c[..., 0], -1, 0)
    cy = jnp.moveaxis(c[..., 1], -1, 0)
    return cx, cy


def _inside_convex(px, py, qx, qy, scale):
    """px, py: (V, ...) points; qx, qy: (4, ...) CCW quad. Returns (V, ...)
    bool: point inside-or-on the quad (tolerance relative to `scale`)."""
    ex = jnp.roll(qx, -1, axis=0) - qx  # (4, ...)
    ey = jnp.roll(qy, -1, axis=0) - qy
    # cross(edge_j, p_i - q_j) for all i, j -> (4v, 4q, ...)
    rx = px[:, None] - qx[None]
    ry = py[:, None] - qy[None]
    cross = ex[None] * ry - ey[None] * rx
    return jnp.all(cross >= -_EPS * scale[None, None], axis=1)


def _intersection_area_xy(ax, ay, bx, by):
    """Intersection area of CCW quad pairs. ax..by: (4, ...); returns (...)."""
    scale = (
        jnp.max(jnp.abs(ax), axis=0) + jnp.max(jnp.abs(ay), axis=0)
        + jnp.max(jnp.abs(bx), axis=0) + jnp.max(jnp.abs(by), axis=0) + 1.0
    )

    # (a) corners of A in B, (b) corners of B in A
    a_in_b = _inside_convex(ax, ay, bx, by, scale)  # (4, ...)
    b_in_a = _inside_convex(bx, by, ax, ay, scale)  # (4, ...)

    # (c) edge-edge crossings: A edge i (P1->P2) x B edge j (P3->P4)
    d1x = (jnp.roll(ax, -1, axis=0) - ax)[:, None]  # (4, 1, ...)
    d1y = (jnp.roll(ay, -1, axis=0) - ay)[:, None]
    d2x = (jnp.roll(bx, -1, axis=0) - bx)[None]     # (1, 4, ...)
    d2y = (jnp.roll(by, -1, axis=0) - by)[None]
    p13x = bx[None] - ax[:, None]                   # (4, 4, ...) P3 - P1
    p13y = by[None] - ay[:, None]
    denom = d1x * d2y - d1y * d2x
    denom_safe = jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    t = (p13x * d2y - p13y * d2x) / denom_safe
    u = (p13x * d1y - p13y * d1x) / denom_safe
    seg_valid = (
        (jnp.abs(denom) >= _EPS)
        & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0)
    )
    ix = ax[:, None] + t * d1x
    iy = ay[:, None] + t * d1y

    batch = ax.shape[1:]
    # 24 masked candidates, batch dims preserved after axis 0.
    px = jnp.concatenate([ax, bx, ix.reshape((16,) + batch)], axis=0)
    py = jnp.concatenate([ay, by, iy.reshape((16,) + batch)], axis=0)
    valid = jnp.concatenate(
        [a_in_b, b_in_a, seg_valid.reshape((16,) + batch)], axis=0)  # (24, ...)
    vf = valid.astype(ax.dtype)
    cnt = jnp.sum(vf, axis=0)  # (...)
    denom_c = jnp.maximum(cnt, 1.0)
    cx0 = jnp.sum(px * vf, axis=0) / denom_c
    cy0 = jnp.sum(py * vf, axis=0) / denom_c

    # Order candidates by angle around the centroid (interior point of a
    # convex region -> angular order IS the polygon ring). TPU note: XLA
    # sort/gather along a small leading axis is slow, so ordering is done as
    # comparison-counting ranks + a one-hot contraction — dense elementwise
    # ops and reductions only. Keys are index work: no gradient.
    ang = jnp.arctan2(py - cy0[None], px - cx0[None])
    key = jax.lax.stop_gradient(jnp.where(valid, ang, _BIG))
    idx = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
    ki, kj = key[:, None], key[None, :]          # (24, 24, ...)
    lt = (kj < ki) | ((kj == ki) & (idx[None, :] < idx[:, None]))
    rank = jnp.sum(lt, axis=1).astype(jnp.int32)  # (24, ...) unique per slot

    # sorted[r] = candidate whose rank == r, via one-hot reduction.
    onehot = (rank[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1,) + rank.shape, 1)).astype(ax.dtype)  # (24i, 24r, ...)
    sx = jnp.sum(onehot * px[:, None], axis=0)   # (24r, ...)
    sy = jnp.sum(onehot * py[:, None], axis=0)

    # Masked shoelace over the first cnt sorted entries. The ring "next" is a
    # roll; the wrap-around term (last live -> first) replaces the rolled
    # pairing at r == cnt-1.
    r_iota = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0)
    live = (r_iota.astype(ax.dtype) < cnt[None]).astype(ax.dtype)
    is_last = (r_iota + 1 == cnt[None].astype(jnp.int32)).astype(ax.dtype)
    nx_roll = jnp.roll(sx, -1, axis=0)
    ny_roll = jnp.roll(sy, -1, axis=0)
    nx = nx_roll * (1 - is_last) + sx[0][None] * is_last
    ny = ny_roll * (1 - is_last) + sy[0][None] * is_last
    area2 = jnp.sum((sx * ny - nx * sy) * live, axis=0)
    # Degenerate (< 3 vertices) collapses to ~0 area on its own.
    return 0.5 * jnp.abs(area2)


def _hull_area_xy(px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Convex-hull area of small point sets, branch-free and batch-last.

    px, py: (V, ...) points (V <= ~16); returns (...) hull areas.

    Maximal-edge formulation (replaces the earlier monotone chain, whose
    vmapped while-in-fori loops serialized per element on TPU — the same
    lesson as the NMS gather rewrite): a directed edge (i, j) lies on the
    CCW hull boundary iff every other point is strictly to its left OR
    collinear and within the segment (so only the MAXIMAL collinear edge
    qualifies, never its sub-segments), and neither endpoint is a duplicate
    of an earlier point. Each hull edge then appears exactly once with CCW
    orientation, so the origin-based shoelace over qualifying edges gives
    2x the area with NO ordering step — the whole kernel is dense
    elementwise (V, V, V, ...) work in the lane dimension.

    Degenerate sets behave like the reference's ConvexHull usage folded
    through the loss: all-collinear / all-duplicate inputs qualify both
    edge directions, whose contributions cancel to area 0.

    Hull membership is discrete (booleans under stop_gradient semantics —
    comparisons carry no gradient), while the shoelace sum keeps the area
    differentiable w.r.t. the points, matching the reference's
    ConvexHull-vertices-only usage
    (src/utils/iou_rotated_boxes_utils.py:130-132).
    """
    scale = jnp.max(jnp.abs(px), axis=0) + jnp.max(jnp.abs(py), axis=0) + 1.0
    eps = _EPS * scale  # length-scaled; predicates only
    eps2 = eps * scale

    # Duplicate suppression: point i may start/end edges only if no earlier
    # point i' < i coincides with it (keeps exactly one representative).
    ddx = px[:, None] - px[None, :]  # (i, i', ...)
    ddy = py[:, None] - py[None, :]
    coincide = (jnp.abs(ddx) <= eps) & (jnp.abs(ddy) <= eps)
    earlier = (jax.lax.broadcasted_iota(jnp.int32, coincide.shape, 1)
               < jax.lax.broadcasted_iota(jnp.int32, coincide.shape, 0))
    rep = ~jnp.any(coincide & earlier, axis=1)  # (V, ...)

    ex = -ddx  # (i, j, ...): p_j - p_i
    ey = -ddy
    len2 = ex * ex + ey * ey
    # cross/t of every point k against edge (i, j): (i, j, k, ...)
    rx = -ddx[:, None]  # p_k - p_i laid out (i, 1, k, ...)
    ry = -ddy[:, None]
    cross = rx * ey[:, :, None] - ry * ex[:, :, None]
    t = rx * ex[:, :, None] + ry * ey[:, :, None]
    # cross and t carry units length^2 -> tolerance eps2 = _EPS * scale^2.
    ok = (cross > eps2) | (
        (jnp.abs(cross) <= eps2) & (t >= -eps2) & (t <= len2[:, :, None] + eps2))
    edge = (jnp.all(ok, axis=2) & (len2 > eps2)
            & rep[:, None] & rep[None, :])  # (i, j, ...)

    area2 = jnp.sum((px[:, None] * py[None, :] - px[None, :] * py[:, None])
                    * edge.astype(px.dtype), axis=(0, 1))
    return 0.5 * jnp.abs(area2)


def _hull_area_8(pts: jnp.ndarray) -> jnp.ndarray:
    """Convex-hull area of (8, 2) points (single set; see `_hull_area_xy`)."""
    return _hull_area_xy(pts[:, 0], pts[:, 1])


def intersection_area(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise intersection area of aligned box arrays (..., 5)."""
    ax, ay = _corners_xy(boxes1)
    bx, by = _corners_xy(boxes2)
    return _intersection_area_xy(ax, ay, bx, by)


def rotated_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise rotated IoU of aligned (..., 5) box arrays."""
    inter = intersection_area(boxes1, boxes2)
    a1 = boxes1[..., 2] * boxes1[..., 3]
    a2 = boxes2[..., 2] * boxes2[..., 3]
    return inter / jnp.maximum(a1 + a2 - inter, _EPS)


def rotated_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise rotated (GIoU, IoU) of aligned (..., 5) box arrays.

    GIoU = IoU - (hull_area - union) / hull_area, hull over the 8 corners
    (semantics of reference src/utils/iou_rotated_boxes_utils.py:98-142).
    """
    inter = intersection_area(boxes1, boxes2)
    ax, ay = _corners_xy(boxes1)
    bx, by = _corners_xy(boxes2)
    hull = _hull_area_xy(jnp.concatenate([ax, bx], axis=0),
                         jnp.concatenate([ay, by], axis=0))
    a1 = boxes1[..., 2] * boxes1[..., 3]
    a2 = boxes2[..., 2] * boxes2[..., 3]
    union = jnp.maximum(a1 + a2 - inter, _EPS)
    iou = inter / union
    giou = iou - (hull - union) / jnp.maximum(hull, _EPS)
    return giou, iou


def pairwise_rotated_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) rotated IoU matrix (anchor matching, NMS,
    eval matching; replaces the reference's shapely double loop at
    src/utils/iou_rotated_boxes_utils.py:82-95)."""
    n, m = boxes1.shape[0], boxes2.shape[0]
    b1 = jnp.broadcast_to(boxes1[:, None, :], (n, m, 5))
    b2 = jnp.broadcast_to(boxes2[None, :, :], (n, m, 5))
    return rotated_iou(b1, b2)
