"""On-device fixed-shape NMS (no host round-trip, no dynamic shapes).

The reference runs per-class CUDA NMS with dynamic box counts
(/root/reference/mmdetection/mmdet/ops/nms/src/nms_kernel.cu:23-67, python
dispatch mmdet/core/post_processing/bbox_nms_kp.py:6-75). On TPU we instead
run a *batched greedy-selection* NMS: all classes are processed as one batch,
and each of the ``max_out`` sequential steps selects the global per-class
argmax and suppresses overlapping boxes with vectorized IoU math. Box counts
are static; invalid/suppressed boxes carry score -inf.

Greedy-selection NMS is order-equivalent to the classic suppression-mask
algorithm, so results match the CUDA kernel (same +1 box-area convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def pairwise_iou_single(box, boxes, offset=1.0):
    """IoU of one box (4,) against (N, 4) boxes, xyxy with +offset widths."""
    x1 = jnp.maximum(box[0], boxes[:, 0])
    y1 = jnp.maximum(box[1], boxes[:, 1])
    x2 = jnp.minimum(box[2], boxes[:, 2])
    y2 = jnp.minimum(box[3], boxes[:, 3])
    iw = jnp.clip(x2 - x1 + offset, 0, None)
    ih = jnp.clip(y2 - y1 + offset, 0, None)
    inter = iw * ih
    area = (box[2] - box[0] + offset) * (box[3] - box[1] + offset)
    areas = (boxes[:, 2] - boxes[:, 0] + offset) * \
            (boxes[:, 3] - boxes[:, 1] + offset)
    union = area + areas - inter
    return inter / jnp.maximum(union, 1e-10)


def greedy_nms(boxes, scores, iou_thr, max_out, offset=1.0):
    """Greedy NMS over (N, 4) boxes / (N,) scores -> fixed (max_out,) picks.

    Returns (keep_idx, keep_scores); invalid slots have score NEG_INF.
    Boxes with score <= NEG_INF/2 are treated as absent.
    """
    def body(state, _):
        scores_cur = state
        best = jnp.argmax(scores_cur)
        best_score = scores_cur[best]
        box = boxes[best]
        iou = pairwise_iou_single(box, boxes, offset)
        suppress = iou > iou_thr
        new_scores = jnp.where(suppress, NEG_INF, scores_cur)
        new_scores = new_scores.at[best].set(NEG_INF)
        # if nothing valid remained, emit an invalid slot
        valid = best_score > NEG_INF / 2
        new_scores = jnp.where(valid, new_scores, scores_cur)
        return new_scores, (jnp.where(valid, best, -1),
                            jnp.where(valid, best_score, NEG_INF))

    _, (keep_idx, keep_scores) = jax.lax.scan(
        body, scores, None, length=max_out)
    return keep_idx, keep_scores


def soft_nms(boxes, scores, iou_thr, max_out, sigma=0.5, min_score=1e-3,
             method='linear', offset=1.0):
    """Soft-NMS (linear/gaussian decay) with fixed output size.

    Greedy selection like greedy_nms, but instead of suppressing overlapping
    boxes their scores decay: linear (1 - iou for iou > thr) or gaussian
    exp(-iou^2 / sigma); boxes falling below min_score are dropped.

    Parity: mmdet/ops/nms/src/soft_nms_cpu.pyx:22-127.
    """
    def body(state, _):
        scores_cur = state
        best = jnp.argmax(scores_cur)
        best_score = scores_cur[best]
        box = boxes[best]
        iou = pairwise_iou_single(box, boxes, offset)
        if method == 'gaussian':
            decay = jnp.exp(-(iou * iou) / sigma)
        else:
            decay = jnp.where(iou > iou_thr, 1.0 - iou, 1.0)
        new_scores = scores_cur * decay
        new_scores = jnp.where(new_scores < min_score, NEG_INF, new_scores)
        new_scores = new_scores.at[best].set(NEG_INF)
        valid = best_score > NEG_INF / 2
        new_scores = jnp.where(valid, new_scores, scores_cur)
        return new_scores, (jnp.where(valid, best, -1),
                            jnp.where(valid, best_score, NEG_INF))

    _, (keep_idx, keep_scores) = jax.lax.scan(
        body, scores, None, length=max_out)
    return keep_idx, keep_scores


def multiclass_nms_kp(boxes, scores, kpts, score_thr, iou_thr,
                      max_per_class=100, max_per_img=100, offset=1.0,
                      nms_type='nms', soft_sigma=0.5, soft_min_score=1e-3):
    """Multi-class NMS carrying keypoints, fully on device with fixed shapes.

    Args:
      boxes: (N, 4) shared class-agnostic boxes (xyxy).
      scores: (N, C) per-class scores (background NOT included).
      kpts: (N, K3) flat keypoint vectors carried through.
      score_thr: min class score.
      iou_thr: NMS IoU threshold.

    Returns (det_bboxes (M, 5), det_labels (M,), det_kpts (M, K3), valid (M,))
    with M = max_per_img; invalid rows zeroed, valid mask marks real dets.

    Parity: mmdet/core/post_processing/bbox_nms_kp.py:6-75 + nms_wrapper.
    """
    N, C = scores.shape
    masked = jnp.where(scores > score_thr, scores, NEG_INF)  # (N, C)
    per_class = jnp.swapaxes(masked, 0, 1)  # (C, N)

    if nms_type == 'soft_nms':
        run = lambda s: soft_nms(boxes, s, iou_thr, max_per_class,
                                 sigma=soft_sigma, min_score=soft_min_score,
                                 offset=offset)
    else:
        run = lambda s: greedy_nms(boxes, s, iou_thr, max_per_class, offset)
    keep_idx, keep_scores = jax.vmap(run)(per_class)  # (C, max_per_class)

    flat_scores = keep_scores.reshape(-1)
    flat_idx = keep_idx.reshape(-1)
    flat_labels = jnp.repeat(jnp.arange(C), max_per_class)

    top_scores, top_pos = jax.lax.top_k(
        flat_scores, min(max_per_img, flat_scores.shape[0]))
    sel_idx = flat_idx[top_pos]
    sel_labels = flat_labels[top_pos]
    valid = top_scores > NEG_INF / 2
    safe_idx = jnp.clip(sel_idx, 0, N - 1)

    det_boxes = jnp.where(valid[:, None], boxes[safe_idx], 0)
    det_scores = jnp.where(valid, top_scores, 0)
    det_bboxes = jnp.concatenate([det_boxes, det_scores[:, None]], axis=-1)
    det_labels = jnp.where(valid, sel_labels, 0)
    det_kpts = jnp.where(valid[:, None], kpts[safe_idx], 0)
    return det_bboxes, det_labels, det_kpts, valid
