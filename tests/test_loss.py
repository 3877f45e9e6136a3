"""Loss tests: dense target assignment vs a numpy oracle of the reference
semantics (yolo_layer.py:69-133), loss properties, gradients, full-net loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from complex_yolov4_tpu.losses.yolo_loss import (
    build_targets_dense,
    head_loss,
    network_loss,
)
from complex_yolov4_tpu.models import get_model_spec
from complex_yolov4_tpu.models import network as net
from complex_yolov4_tpu.models.spec import YoloSpec
from complex_yolov4_tpu.models.yolo_head import decode_head
from complex_yolov4_tpu.ops import rotated_boxes as rb

G = 8
NC = 3
ANCHORS_GRID = np.array([  # (w, h, im, re) in grid units
    [1.0, 2.0, 0.0, 1.0],
    [2.0, 2.0, 0.0, 1.0],
    [3.0, 5.0, 0.0, 1.0],
], np.float32)


def np_oracle_assignment(targets, mask, anchors, g, ignore_thresh):
    """Reference build_targets transcribed in numpy with explicit
    last-write-wins loops (test oracle)."""
    b_sz, t_cap, _ = targets.shape
    na = anchors.shape[0]
    obj = np.zeros((b_sz, na, g, g))
    noobj = np.ones((b_sz, na, g, g))
    tx = np.zeros((b_sz, na, g, g))
    ty = np.zeros((b_sz, na, g, g))
    tw = np.zeros((b_sz, na, g, g))
    th = np.zeros((b_sz, na, g, g))
    tcls = np.zeros((b_sz, na, g, g, NC))
    for b in range(b_sz):
        for t in range(t_cap):
            if mask[b, t] <= 0.5:
                continue
            cl = int(targets[b, t, 0])
            gx, gy = targets[b, t, 1] * g, targets[b, t, 2] * g
            gw, gh = targets[b, t, 3] * g, targets[b, t, 4] * g
            im, re = targets[b, t, 5], targets[b, t, 6]
            yaw = np.arctan2(im, re)
            ious = np.array([
                float(rb.rotated_iou(
                    jnp.asarray([[0.0, 0.0, gw, gh, yaw]]),
                    jnp.asarray([[0.0, 0.0, a[0], a[1], float(np.arctan2(a[2], a[3]))]]))[0])
                for a in anchors
            ])
            best = int(np.argmax(ious))
            gi, gj = int(gx), int(gy)
            obj[b, best, gj, gi] = 1
            noobj[b, best, gj, gi] = 0
            noobj[b, ious > ignore_thresh, gj, gi] = 0
            tx[b, best, gj, gi] = gx - np.floor(gx)
            ty[b, best, gj, gi] = gy - np.floor(gy)
            tw[b, best, gj, gi] = np.log(gw / anchors[best, 0] + 1e-16)
            th[b, best, gj, gi] = np.log(gh / anchors[best, 1] + 1e-16)
            tcls[b, best, gj, gi] = 0
            tcls[b, best, gj, gi, cl] = 1
    return obj, noobj, tx, ty, tw, th, tcls


def to_model_layout(grid_ref):
    """(B, A, G, G) reference layout -> flat (B*G*G*A) model layout."""
    return np.transpose(grid_ref, (0, 2, 3, 1)).reshape(-1)


def make_targets(rng, b_sz=2, t_cap=12, n_live=6):
    targets = np.zeros((b_sz, t_cap, 7), np.float32)
    mask = np.zeros((b_sz, t_cap), np.float32)
    for b in range(b_sz):
        for t in range(n_live):
            yaw = rng.uniform(-np.pi, np.pi)
            targets[b, t] = [
                rng.integers(0, NC),
                rng.uniform(0.05, 0.95), rng.uniform(0.05, 0.95),
                rng.uniform(0.05, 0.4), rng.uniform(0.05, 0.6),
                np.sin(yaw), np.cos(yaw),
            ]
            mask[b, t] = 1
    return targets, mask


def test_assignment_matches_oracle():
    rng = np.random.default_rng(0)
    targets, mask = make_targets(rng)
    dense = build_targets_dense(
        G, jnp.asarray(ANCHORS_GRID), NC, jnp.asarray(targets), jnp.asarray(mask), 0.7)
    obj, noobj, tx, ty, tw, th, tcls = np_oracle_assignment(
        targets, mask, ANCHORS_GRID, G, 0.7)
    np.testing.assert_allclose(np.asarray(dense["obj"]), to_model_layout(obj))
    np.testing.assert_allclose(np.asarray(dense["noobj"]), to_model_layout(noobj))
    np.testing.assert_allclose(np.asarray(dense["tx"]), to_model_layout(tx), atol=2e-6)
    np.testing.assert_allclose(np.asarray(dense["ty"]), to_model_layout(ty), atol=2e-6)
    np.testing.assert_allclose(np.asarray(dense["tw"]), to_model_layout(tw), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dense["th"]), to_model_layout(th), atol=2e-5)
    got_cls = np.asarray(dense["tcls"]).reshape(2, G, G, 3, NC).transpose(0, 3, 1, 2, 4)
    np.testing.assert_allclose(got_cls, tcls)


def test_last_target_wins_on_duplicate_cell():
    """Two targets in the same cell + same best anchor: the later row wins
    (torch index-put parity)."""
    targets = np.zeros((1, 4, 7), np.float32)
    mask = np.zeros((1, 4), np.float32)
    # same cell (4, 4), same size -> same best anchor; different sub-offsets
    targets[0, 0] = [0, 4.2 / G, 4.3 / G, 0.25, 0.25, 0.0, 1.0]
    targets[0, 1] = [1, 4.7 / G, 4.6 / G, 0.25, 0.25, 0.0, 1.0]
    mask[0, :2] = 1
    dense = build_targets_dense(
        G, jnp.asarray(ANCHORS_GRID), NC, jnp.asarray(targets), jnp.asarray(mask), 0.7)
    assert float(jnp.sum(dense["obj"])) == 1.0
    nz = int(jnp.argmax(dense["obj"]))
    assert float(dense["tx"][nz]) == pytest.approx(0.7, abs=1e-6)
    assert float(dense["ty"][nz]) == pytest.approx(0.6, abs=1e-6)
    got_cls = np.asarray(dense["tcls"][nz])
    np.testing.assert_allclose(got_cls, [0, 1, 0])
    # both targets still report is_winner correctly
    assert not bool(dense["is_winner"][0, 0])
    assert bool(dense["is_winner"][0, 1])


def _raw_from_dense(dense, conf_obj=1.0, conf_noobj=0.0, spec=None):
    """Build a synthetic decode dict whose predictions exactly equal the
    assigned targets (perfect-prediction scenario)."""
    na = ANCHORS_GRID.shape[0]
    b_sz = 2
    shape4 = (b_sz, G, G, na)
    obj = np.asarray(dense["obj"]).reshape(shape4)
    pred_x = np.asarray(dense["tx"]).reshape(shape4)
    pred_y = np.asarray(dense["ty"]).reshape(shape4)
    pred_w = np.asarray(dense["tw"]).reshape(shape4)
    pred_h = np.asarray(dense["th"]).reshape(shape4)
    pred_im = np.asarray(dense["tim"]).reshape(shape4)
    pred_re = np.asarray(dense["tre"]).reshape(shape4)
    # off-object cells get unit-circle angles so the circle term stays 0
    pred_im = np.where(obj > 0, pred_im, 0.0)
    pred_re = np.where(obj > 0, pred_re, 1.0)
    pred_conf = np.where(obj > 0, conf_obj, conf_noobj).astype(np.float32)
    pred_cls = np.asarray(dense["tcls"]).reshape(shape4 + (NC,))

    grid_x = np.arange(G)[None, None, :, None]
    grid_y = np.arange(G)[None, :, None, None]
    bw = np.exp(pred_w) * ANCHORS_GRID[:, 0]
    bh = np.exp(pred_h) * ANCHORS_GRID[:, 1]
    pred_boxes = np.stack(
        [pred_x + grid_x, pred_y + grid_y, bw, bh, pred_im, pred_re], axis=-1)
    return {
        "grid_size": G,
        "stride": 608 / G,
        "scaled_anchors": jnp.asarray(ANCHORS_GRID),
        "pred_x": jnp.asarray(pred_x), "pred_y": jnp.asarray(pred_y),
        "pred_w": jnp.asarray(pred_w), "pred_h": jnp.asarray(pred_h),
        "pred_im": jnp.asarray(pred_im), "pred_re": jnp.asarray(pred_re),
        "pred_conf": jnp.asarray(pred_conf), "pred_cls": jnp.asarray(pred_cls),
        "pred_boxes": jnp.asarray(pred_boxes, jnp.float32),
        "output": jnp.zeros((b_sz, G * G * na, 7 + NC)),
    }


HEAD_SPEC = YoloSpec(anchors=((76, 152, 0, 1), (152, 152, 0, 1), (228, 380, 0, 1)),
                     num_classes=NC, stride=76)


def test_perfect_prediction_near_zero_loss():
    rng = np.random.default_rng(1)
    targets, mask = make_targets(rng)
    dense = build_targets_dense(
        G, jnp.asarray(ANCHORS_GRID), NC, jnp.asarray(targets), jnp.asarray(mask), 0.7)
    raw = _raw_from_dense(dense)
    total, metrics = head_loss(raw, HEAD_SPEC, jnp.asarray(targets), jnp.asarray(mask))
    assert float(total) < 1e-3, dict((k, float(v)) for k, v in metrics.items())
    assert float(metrics["cls_acc"]) == pytest.approx(100.0)
    # GIoU mode: iou == 1 for matched boxes except duplicate-cell losers
    total_g, metrics_g = head_loss(
        raw, HEAD_SPEC, jnp.asarray(targets), jnp.asarray(mask), use_giou_loss=True)
    assert float(metrics_g["giou_loss"]) < 0.05
    assert float(total_g) < 0.5


def test_wrong_conf_increases_loss():
    rng = np.random.default_rng(2)
    targets, mask = make_targets(rng)
    dense = build_targets_dense(
        G, jnp.asarray(ANCHORS_GRID), NC, jnp.asarray(targets), jnp.asarray(mask), 0.7)
    good, _ = head_loss(_raw_from_dense(dense, 1.0, 0.0), HEAD_SPEC,
                        jnp.asarray(targets), jnp.asarray(mask))
    bad, m = head_loss(_raw_from_dense(dense, 0.3, 0.2), HEAD_SPEC,
                       jnp.asarray(targets), jnp.asarray(mask))
    assert float(bad) > float(good) + 1.0
    # noobj term dominates via the 100x scale
    assert float(m["loss_obj"]) > 10.0


def test_empty_targets_finite():
    targets = np.zeros((2, 12, 7), np.float32)
    mask = np.zeros((2, 12), np.float32)
    dense = build_targets_dense(
        G, jnp.asarray(ANCHORS_GRID), NC, jnp.asarray(targets), jnp.asarray(mask), 0.7)
    assert float(jnp.sum(dense["obj"])) == 0
    assert float(jnp.sum(1 - dense["noobj"])) == 0
    raw = _raw_from_dense(dense, conf_obj=0.5, conf_noobj=0.5)
    total, metrics = head_loss(raw, HEAD_SPEC, jnp.asarray(targets), jnp.asarray(mask))
    assert np.isfinite(float(total))


def test_network_loss_end_to_end_and_grad():
    """Full tiny model: loss through real decode + gradient flows, jitted."""
    spec = get_model_spec("complex_yolov4_tiny", width=96, height=96)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    targets, mask = make_targets(rng, b_sz=2, t_cap=8, n_live=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))

    def loss_fn(p):
        (_, head_raw), _ = net.apply(spec, p, state, x, train=True,
                                     compute_dtype=jnp.float32)
        total, _ = network_loss(spec, head_raw, jnp.asarray(targets), jnp.asarray(mask))
        return total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    gnorm = float(jax.jit(lambda g: jnp.sqrt(sum(
        jnp.sum(v ** 2) for leaf in jax.tree_util.tree_leaves(g) for v in [leaf])))(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    def loss_giou(p):
        (_, head_raw), _ = net.apply(spec, p, state, x, train=True,
                                     compute_dtype=jnp.float32)
        total, _ = network_loss(spec, head_raw, jnp.asarray(targets),
                                jnp.asarray(mask), use_giou_loss=True)
        return total

    lg, grads_g = jax.jit(jax.value_and_grad(loss_giou))(params)
    assert np.isfinite(float(lg))
    leaves = jax.tree_util.tree_leaves(grads_g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(bool((l != 0).any()) for l in leaves)


def test_bce_saturated_gradients_finite():
    """Saturated sigmoid outputs (p exactly 0/1) must give bounded gradients
    (torch parity: grad = (p-t)/clamp(p(1-p), 1e-12); the naive form NaNs)."""
    from complex_yolov4_tpu.losses.yolo_loss import _bce

    p = jnp.asarray([0.0, 1.0, 0.5, 1e-20, 1.0 - 1e-7])
    t = jnp.asarray([1.0, 0.0, 1.0, 1.0, 0.0])
    val = _bce(p, t)
    assert bool(jnp.isfinite(val).all())
    g = jax.grad(lambda p: jnp.sum(_bce(p, t)))(p)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.max(jnp.abs(g))) <= 1.1e12
    # interior point matches the analytic derivative
    g_mid = float(jax.grad(lambda p: _bce(p, jnp.float32(1.0)))(jnp.float32(0.5)))
    assert g_mid == pytest.approx(-2.0, rel=1e-5)


def test_circle_term_zero_angle_gradient_finite():
    rng = np.random.default_rng(4)
    targets, mask = make_targets(rng)
    dense = build_targets_dense(
        G, jnp.asarray(ANCHORS_GRID), NC, jnp.asarray(targets), jnp.asarray(mask), 0.7)
    raw = _raw_from_dense(dense)
    # zero out im/re everywhere: sqrt(0) in the circle term
    raw["pred_im"] = jnp.zeros_like(raw["pred_im"])
    raw["pred_re"] = jnp.zeros_like(raw["pred_re"])

    def loss_of_imre(imre):
        r = dict(raw)
        r["pred_im"], r["pred_re"] = imre
        total, _ = head_loss(r, HEAD_SPEC, jnp.asarray(targets), jnp.asarray(mask))
        return total

    g = jax.grad(loss_of_imre)((raw["pred_im"], raw["pred_re"]))
    assert all(bool(jnp.isfinite(x).all()) for x in g)
