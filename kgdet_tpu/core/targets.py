"""Target assignment & target building, fully vectorized for TPU.

The reference assigns GTs with a per-GT python loop on mixed CPU/GPU tensors
(/root/reference/mmdetection/mmdet/core/bbox/assigners/point_assigner.py:72-109)
and scatters targets per image (mmdet/core/anchor/point_target_kp.py:98-169).
Here the whole computation is a fixed-shape (G, P) distance-matrix program
vmapped over the batch, so it jits into the train step:

- each GT is mapped to its pyramid level by log2 scale;
- a GT's candidates are the ``pos_num`` closest (center-distance normalized by
  GT w/h) valid grid points of its level (top-k over the masked row);
- each point takes the *nearest* of the GTs that selected it. This reproduces
  the reference's sequential keep-if-closer loop exactly, because that loop
  always retains the minimum-distance GT (ties -> lower GT index, which is
  argmin's tie rule).

Padded GTs / invalid grid points are masked with +inf distances.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = 1e9
# deterministic tie-break between equidistant grid points inside one GT's
# top-k (torch.topk breaks ties by index); also harmless across GTs since the
# perturbation is identical for a fixed point.
TIE_EPS = 1e-6


class PointTargets(NamedTuple):
    labels: jnp.ndarray          # (B, P) int32, 0 = bg/pad
    label_weights: jnp.ndarray   # (B, P) float, 0 on invalid grid points
    bbox_gt: jnp.ndarray         # (B, P, 4)
    bbox_weights: jnp.ndarray    # (B, P, 4)
    kpt_gt: jnp.ndarray          # (B, P, K*2) interleaved (x, y)
    kpt_weights: jnp.ndarray     # (B, P, K*2)
    num_pos: jnp.ndarray         # (B,) int32 (clamped to >= 1)


def assign_points_single(points, point_valid, gt_bboxes, gt_mask,
                         scale, pos_num):
    """Vectorized PointAssigner for one image.

    points: (P, 3) (x, y, stride); point_valid: (P,) bool;
    gt_bboxes: (G, 4) xyxy; gt_mask: (G,) bool.
    Returns (assigned_gt (P,) int32 index into G, pos_mask (P,) bool).
    """
    P = points.shape[0]
    G = gt_bboxes.shape[0]
    pts_xy = points[:, :2]
    pts_lvl = jnp.log2(points[:, 2]).astype(jnp.int32)
    lvl_min = jnp.min(pts_lvl)
    lvl_max = jnp.max(pts_lvl)

    ctr = (gt_bboxes[:, :2] + gt_bboxes[:, 2:]) / 2
    wh = jnp.clip(gt_bboxes[:, 2:] - gt_bboxes[:, :2], 1e-6, None)
    # torch's .int() truncates toward zero, not floor
    gt_lvl = jnp.trunc(
        (jnp.log2(wh[:, 0] / scale) + jnp.log2(wh[:, 1] / scale)) / 2
    ).astype(jnp.int32)
    gt_lvl = jnp.clip(gt_lvl, lvl_min, lvl_max)

    diff = (pts_xy[None, :, :] - ctr[:, None, :]) / wh[:, None, :]
    dist = jnp.linalg.norm(diff, axis=-1)  # (G, P)
    eligible = (pts_lvl[None, :] == gt_lvl[:, None]) \
        & point_valid[None, :] & gt_mask[:, None]
    dist = jnp.where(eligible, dist, INF)
    dist = dist + jnp.arange(P)[None, :] * TIE_EPS

    # per-GT top-pos_num nearest points -> candidate threshold
    neg_topk, _ = jax.lax.top_k(-dist, min(pos_num, P))  # (G, <=pos_num)
    kth = -neg_topk[:, -1]                             # (G,)
    candidate = (dist <= kth[:, None]) & (dist < INF / 2)

    per_point = jnp.where(candidate, dist, INF)        # (G, P)
    assigned_gt = jnp.argmin(per_point, axis=0)        # (P,)
    min_dist = jnp.min(per_point, axis=0)
    pos_mask = min_dist < INF / 2
    return assigned_gt.astype(jnp.int32), pos_mask


def _targets_from_assignment(assigned, pos, ignore, valid, bboxes, labels,
                             kpts):
    """Scatter GT boxes/labels/keypoints onto assigned grid slots."""
    K = kpts.shape[1]
    posf = pos.astype(jnp.float32)
    labels_out = jnp.where(pos, labels[assigned], 0)
    label_weights = (valid & ~ignore).astype(jnp.float32)
    bbox_gt = bboxes[assigned] * posf[:, None]
    bbox_weights = jnp.broadcast_to(posf[:, None], bbox_gt.shape)
    kp = kpts[assigned]                                     # (P, K, 3)
    kpt_gt = (kp[:, :, :2] * posf[:, None, None]).reshape(-1, K * 2)
    vis = (kp[:, :, 2] != 0).astype(jnp.float32) * posf[:, None]
    kpt_weights = jnp.repeat(vis, 2, axis=-1)               # (P, K*2)
    num_pos = jnp.maximum(pos.sum().astype(jnp.int32), 1)
    return (labels_out.astype(jnp.int32), label_weights, bbox_gt,
            bbox_weights, kpt_gt, kpt_weights, num_pos)


def max_iou_targets(candidates, cand_valid, gt_bboxes, gt_labels, gt_kpts,
                    gt_mask, pos_iou_thr=0.5, neg_iou_thr=0.4,
                    min_pos_iou=0.0, gt_bboxes_ignore=None,
                    gt_ignore_mask=None, ignore_iof_thr=-1.0):
    """Batched refine-stage targets via MaxIoU assignment over candidate boxes.

    candidates: (B, P, 4) decoded init boxes; other args as point_targets.
    Parity: point_target_kp with a MaxIoUAssigner cfg (serial/parallel refine
    stage, reppoints_head_kp_serial.py:548-575), including the crowd-region
    IoF exclusion (max_iou_assigner.py:38-44).
    """
    from kgdet_tpu.core.iou_assign import assign_max_iou

    if gt_bboxes_ignore is None:
        B = gt_bboxes.shape[0]
        gt_bboxes_ignore = jnp.zeros((B, 1, 4), jnp.float32)
        gt_ignore_mask = jnp.zeros((B, 1), bool)

    def single(cand, valid, bboxes, labels, kpts, mask, ign, ign_mask):
        a = assign_max_iou(cand, valid, bboxes, mask,
                           pos_iou_thr, neg_iou_thr, min_pos_iou,
                           gt_bboxes_ignore=ign, gt_ignore_mask=ign_mask,
                           ignore_iof_thr=ignore_iof_thr)
        return _targets_from_assignment(
            a.assigned_gt, a.pos_mask, a.ignore_mask, valid, bboxes, labels,
            kpts)

    outs = jax.vmap(single)(candidates, cand_valid, gt_bboxes, gt_labels,
                            gt_kpts, gt_mask, gt_bboxes_ignore,
                            gt_ignore_mask)
    return PointTargets(*outs)


def point_targets(points, point_valid, gt_bboxes, gt_labels, gt_kpts,
                  gt_mask, scale=4, pos_num=25):
    """Batched cls/bbox/keypoint targets (parity: point_target_kp).

    points: (P, 3); point_valid: (B, P); gt_bboxes: (B, G, 4);
    gt_labels: (B, G) (1-based, 0 = pad); gt_kpts: (B, G, K, 3);
    gt_mask: (B, G).
    """
    B = gt_bboxes.shape[0]
    K = gt_kpts.shape[2]

    def single(valid, bboxes, labels, kpts, mask):
        assigned, pos = assign_points_single(
            points, valid, bboxes, mask, scale, pos_num)
        ignore = jnp.zeros_like(pos)
        return _targets_from_assignment(assigned, pos, ignore, valid,
                                        bboxes, labels, kpts)

    outs = jax.vmap(single)(point_valid, gt_bboxes, gt_labels, gt_kpts,
                            gt_mask)
    return PointTargets(*outs)
