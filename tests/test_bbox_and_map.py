"""bbox transforms round-trips, soft-NMS, VOC mAP/recall tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from kgdet_tpu.core.bbox_transforms import (
    bbox2delta, bbox2result, bbox2roi, delta2bbox, distance2bbox)
from kgdet_tpu.eval.mean_ap import (
    average_precision, eval_map, eval_recalls, tpfp_default)
from kgdet_tpu.ops.nms import NEG_INF, soft_nms


def test_delta_roundtrip():
    rng = np.random.RandomState(0)
    ctr = rng.uniform(50, 150, (8, 2))
    wh = rng.uniform(20, 80, (8, 2))
    props = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1)
    ctr2 = ctr + rng.uniform(-10, 10, (8, 2))
    wh2 = wh * rng.uniform(0.7, 1.4, (8, 2))
    gts = np.concatenate([ctr2 - wh2 / 2, ctr2 + wh2 / 2], -1)
    deltas = bbox2delta(jnp.asarray(props), jnp.asarray(gts))
    back = delta2bbox(jnp.asarray(props), deltas)
    np.testing.assert_allclose(np.asarray(back), gts, atol=1e-3)


def test_distance2bbox_and_roi():
    pts = jnp.asarray([[10.0, 20.0]])
    d = jnp.asarray([[3.0, 4.0, 5.0, 6.0]])
    np.testing.assert_allclose(np.asarray(distance2bbox(pts, d))[0],
                               [7, 16, 15, 26])
    rois = bbox2roi([jnp.zeros((2, 4)), jnp.ones((3, 4))])
    assert rois.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(rois)[:, 0], [0, 0, 1, 1, 1])


def test_bbox2result_partition():
    dets = np.array([[0, 0, 1, 1, 0.9], [2, 2, 3, 3, 0.8]])
    labels = np.array([0, 2])
    out = bbox2result(dets, labels, 3)
    assert len(out) == 3 and len(out[0]) == 1 and len(out[1]) == 0


# ------------------------------------------------------------------ soft-NMS
def np_soft_nms_linear(boxes, scores, thr, min_score, offset=1.0):
    scores = scores.copy()
    keep = []
    while True:
        i = int(np.argmax(scores))
        if scores[i] <= NEG_INF / 2:
            break
        keep.append((i, scores[i]))
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        iw = np.clip(x2 - x1 + offset, 0, None)
        ih = np.clip(y2 - y1 + offset, 0, None)
        inter = iw * ih
        a = (boxes[i, 2] - boxes[i, 0] + offset) * \
            (boxes[i, 3] - boxes[i, 1] + offset)
        b = (boxes[:, 2] - boxes[:, 0] + offset) * \
            (boxes[:, 3] - boxes[:, 1] + offset)
        iou = inter / (a + b - inter)
        decay = np.where(iou > thr, 1.0 - iou, 1.0)
        scores = scores * decay
        scores[scores < min_score] = NEG_INF
        scores[i] = NEG_INF
    return keep


def test_soft_nms_matches_numpy():
    rng = np.random.RandomState(3)
    N = 30
    ctr = rng.uniform(20, 80, (N, 2))
    wh = rng.uniform(10, 30, (N, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(
        np.float32)
    scores = rng.uniform(0.1, 1, N).astype(np.float32)
    keep_idx, keep_scores = soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, N, min_score=0.05)
    got = [(int(i), float(s)) for i, s in zip(keep_idx, keep_scores)
           if s > NEG_INF / 2]
    want = np_soft_nms_linear(boxes, scores, 0.3, 0.05)
    assert [i for i, _ in got] == [i for i, _ in want]
    np.testing.assert_allclose([s for _, s in got], [s for _, s in want],
                               rtol=1e-4)


# ----------------------------------------------------------------- VOC mAP
def test_average_precision_perfect():
    assert average_precision([0.5, 1.0], [1.0, 1.0]) == pytest.approx(1.0)
    assert average_precision([0.5, 1.0], [1.0, 1.0],
                             '11points') == pytest.approx(1.0)


def test_eval_map_perfect_and_degraded():
    gt_boxes = [np.array([[10, 10, 50, 50], [60, 60, 90, 90]], float)]
    gt_labels = [np.array([1, 2])]
    dets_perfect = [[np.array([[10, 10, 50, 50, 0.9]]),
                     np.array([[60, 60, 90, 90, 0.8]])]]
    m, per = eval_map(dets_perfect, gt_boxes, gt_labels)
    assert m == pytest.approx(1.0)
    # a false positive in class 1 lowers its AP
    dets_fp = [[np.array([[10, 10, 50, 50, 0.5],
                          [100, 100, 120, 120, 0.9]]),
                np.array([[60, 60, 90, 90, 0.8]])]]
    m2, _ = eval_map(dets_fp, gt_boxes, gt_labels)
    assert m2 < 1.0


def test_eval_recalls():
    gts = [np.array([[10, 10, 50, 50]], float)]
    props = [np.array([[11, 11, 49, 49, 0.9], [200, 200, 220, 220, 0.5]],
                      float)]
    r = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5, 0.9))
    assert r[0, 0] == 1.0      # top-1 proposal hits at 0.5
    assert r.shape == (2, 2)


def test_tpfp_no_gts():
    tp, fp = tpfp_default(np.array([[0, 0, 5, 5, 0.9]]), np.zeros((0, 4)))
    assert fp.sum() == 1 and tp.sum() == 0
