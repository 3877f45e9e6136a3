"""NMS and evaluation tests: greedy merge vs a numpy oracle of
post_processing_v2 (reference: src/utils/evaluation_utils.py:321-357),
AP protocol checks, and an oracle-detection mAP=1 end-to-end case.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from complex_yolov4_tpu.evaluation import metrics as M
from complex_yolov4_tpu.ops import rotated_boxes as rb
from complex_yolov4_tpu.ops.nms import nms_batch, nms_single


def np_nms_oracle(decoded, conf_thresh, nms_thresh):
    """Sequential transcription of the reference greedy NMS (test oracle)."""
    decoded = np.asarray(decoded, np.float64)
    keep = decoded[decoded[:, 6] >= conf_thresh]
    if keep.shape[0] == 0:
        return np.zeros((0, 9))
    score = keep[:, 6] * keep[:, 7:].max(axis=1)
    keep = keep[np.argsort(-score)]
    cls_conf = keep[:, 7:].max(axis=1)
    cls_id = keep[:, 7:].argmax(axis=1)
    det = np.concatenate([keep[:, :7], cls_conf[:, None], cls_id[:, None]], axis=1)

    # one batched IoU matrix on device, then the sequential loop in numpy
    b5 = np.stack([det[:, 0], det[:, 1], det[:, 2], det[:, 3],
                   np.arctan2(det[:, 4], det[:, 5])], axis=1)
    iou = np.asarray(rb.pairwise_rotated_iou(
        jnp.asarray(b5, jnp.float32), jnp.asarray(b5, jnp.float32)))

    out = []
    alive = np.ones(det.shape[0], bool)
    while alive.any():
        i = int(np.argmax(alive))  # highest-score remaining
        overlap = iou[i] > nms_thresh
        match = det[i, 8] == det[:, 8]
        invalid = overlap & match & alive
        w = det[invalid, 6:7]
        merged = det[i].copy()
        merged[:6] = (w * det[invalid, :6]).sum(0) / w.sum()
        out.append(merged)
        alive &= ~invalid
    return np.stack(out)


def make_decoded(rng, n=40, nc=3):
    """Clustered random detections with plausible geometry."""
    centers = rng.uniform(50, 550, (5, 2))
    rows = []
    for _ in range(n):
        c = centers[rng.integers(0, 5)]
        x, y = c + rng.normal(0, 6, 2)
        w, l = rng.uniform(15, 40), rng.uniform(25, 70)
        yaw = rng.uniform(-np.pi, np.pi)
        conf = rng.uniform(0, 1)
        cls = rng.dirichlet(np.ones(nc))
        rows.append([x, y, w, l, np.sin(yaw), np.cos(yaw), conf, *cls])
    return np.array(rows, np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    decoded = make_decoded(rng)
    dets, mask = nms_single(jnp.asarray(decoded), 0.5, 0.5, max_boxes=64)
    got = np.asarray(dets)[np.asarray(mask) > 0.5]
    ref = np_nms_oracle(decoded, 0.5, 0.5)
    assert got.shape[0] == ref.shape[0]
    np.testing.assert_allclose(got[:, :6], ref[:, :6], atol=1e-3)
    np.testing.assert_allclose(got[:, 6:8], ref[:, 6:8], atol=1e-5)
    np.testing.assert_allclose(got[:, 8], ref[:, 8])


def test_nms_no_survivors():
    rng = np.random.default_rng(3)
    decoded = make_decoded(rng)
    decoded[:, 6] = 0.01
    dets, mask = nms_single(jnp.asarray(decoded), 0.5, 0.5, max_boxes=16)
    assert float(np.asarray(mask).sum()) == 0
    assert np.all(np.asarray(dets) == 0)


def test_nms_batch_shapes():
    rng = np.random.default_rng(4)
    batch = np.stack([make_decoded(rng), make_decoded(rng)])
    dets, masks = nms_batch(jnp.asarray(batch), 0.3, 0.5, max_boxes=32)
    assert dets.shape == (2, 32, 9) and masks.shape == (2, 32)


def test_nms_keeps_distinct_classes():
    """Same box, different classes: both survive (label_match gating)."""
    rows = np.zeros((2, 10), np.float32)
    rows[0] = [100, 100, 20, 40, 0, 1, 0.9, 0.9, 0.05, 0.05]
    rows[1] = [100, 100, 20, 40, 0, 1, 0.8, 0.05, 0.9, 0.05]
    dets, mask = nms_single(jnp.asarray(rows), 0.5, 0.5, max_boxes=8)
    assert float(np.asarray(mask).sum()) == 2


def test_compute_ap_known_curve():
    # single-class: preds sorted by conf, TP pattern [1, 0, 1], 2 GT
    recall = np.array([0.5, 0.5, 1.0])
    precision = np.array([1.0, 0.5, 2 / 3])
    ap = M.compute_ap(recall, precision)
    assert ap == pytest.approx(0.5 * 1.0 + 0.5 * (2 / 3), abs=1e-9)


def test_ap_per_class_perfect_and_empty():
    tp = np.array([1.0, 1.0, 1.0])
    conf = np.array([0.9, 0.8, 0.7])
    pred_cls = np.array([0.0, 0.0, 1.0])
    target_cls = np.array([0.0, 0.0, 1.0])
    p, r, ap, f1, cls = M.ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_allclose(ap, 1.0)
    np.testing.assert_allclose(f1, 1.0, atol=1e-6)
    # class with GT but no predictions -> AP 0
    p2, r2, ap2, _, cls2 = M.ap_per_class(
        tp, conf, pred_cls, np.array([0.0, 0.0, 1.0, 2.0]))
    assert 2 in cls2 and ap2[list(cls2).index(2)] == 0


def test_sample_statistics_matching():
    img_size = 608.0
    targets = np.zeros((4, 7), np.float32)
    tmask = np.zeros((4,), np.float32)
    targets[0] = [0, 0.5, 0.5, 0.05, 0.1, 0.0, 1.0]
    targets[1] = [1, 0.2, 0.2, 0.03, 0.05, 0.0, 1.0]
    tmask[:2] = 1
    # det 0 matches target 0; det 1 wrong class; det 2 duplicate of target 0
    dets = np.zeros((3, 9), np.float32)
    dmask = np.ones((3,), np.float32)
    dets[0] = [0.5 * 608, 0.5 * 608, 0.05 * 608, 0.1 * 608, 0, 1, 0.9, 0.9, 0]
    dets[1] = [0.2 * 608, 0.2 * 608, 0.03 * 608, 0.05 * 608, 0, 1, 0.8, 0.8, 2]
    dets[2] = [0.5 * 608 + 2, 0.5 * 608, 0.05 * 608, 0.1 * 608, 0, 1, 0.7, 0.7, 0]
    tp, scores, labels = M.sample_statistics(dets, dmask, targets, tmask, 0.5, img_size)
    np.testing.assert_allclose(tp, [1.0, 0.0, 0.0])
    np.testing.assert_allclose(labels, [0, 2, 0])


def test_summarize_map_oracle_detections():
    """Detections copied from ground truth -> mAP == 1."""
    rng = np.random.default_rng(7)
    stats, labels = [], []
    for _ in range(4):
        targets = np.zeros((8, 7), np.float32)
        tmask = np.zeros((8,), np.float32)
        n = int(rng.integers(1, 5))
        for t in range(n):
            yaw = rng.uniform(-np.pi, np.pi)
            targets[t] = [rng.integers(0, 3), rng.uniform(0.2, 0.8),
                          rng.uniform(0.2, 0.8), 0.05, 0.1, np.sin(yaw), np.cos(yaw)]
            tmask[t] = 1
        dets = np.zeros((n, 9), np.float32)
        for t in range(n):
            dets[t, :6] = [targets[t, 1] * 608, targets[t, 2] * 608,
                           targets[t, 3] * 608, targets[t, 4] * 608,
                           targets[t, 5], targets[t, 6]]
            dets[t, 6:] = [0.95, 0.95, targets[t, 0]]
        stats.append(M.sample_statistics(dets, np.ones(n), targets, tmask, 0.5, 608.0))
        labels.append(targets[tmask > 0.5][:, 0])
    out = M.summarize_map(stats, labels)
    assert out["mAP"] == pytest.approx(1.0)
    np.testing.assert_allclose(out["precision"], 1.0)
    np.testing.assert_allclose(out["recall"], 1.0)
