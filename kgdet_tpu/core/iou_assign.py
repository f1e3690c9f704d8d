"""MaxIoU assignment, fully vectorized (fixed shapes, jit-safe).

TPU-native reformulation of the reference's MaxIoUAssigner
(/root/reference/mmdetection/mmdet/core/bbox/assigners/max_iou_assigner.py):
the whole assignment is one (G, P) IoU matrix program — no python loops over
GTs — reproducing the reference's semantics:

  1. each candidate takes its max-IoU GT;
  2. max IoU < neg_thr  -> negative, in [neg_thr, pos_thr) -> ignored;
  3. each GT additionally claims every candidate tied at the GT's own best
     IoU when that best >= min_pos_iou (gt_max_assign_all=True), applied in
     GT order so later GTs override earlier ones (torch loop order).

Padded GTs/invalid candidates are masked out of the IoU matrix.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def iou_xyxy(a, b, eps=1e-6):
    """IoU matrix between (G, 4) and (P, 4) xyxy boxes (exclusive widths)."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * \
        jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * \
        jnp.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, eps)


def iof_xyxy(a, b, eps=1e-6):
    """Intersection-over-foreground matrix: inter(a_i, b_j) / area(a_i)."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * \
        jnp.clip(a[:, 3] - a[:, 1], 0, None)
    return inter / jnp.maximum(area_a[:, None], eps)


class IoUAssignment(NamedTuple):
    assigned_gt: jnp.ndarray   # (P,) int32 index into G (valid where pos)
    pos_mask: jnp.ndarray      # (P,) bool
    ignore_mask: jnp.ndarray   # (P,) bool — neither positive nor negative
    max_iou: jnp.ndarray       # (P,) float best-GT IoU (-1 for masked)


def assign_max_iou(candidates, cand_valid, gt_bboxes, gt_mask,
                   pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                   gt_bboxes_ignore=None, gt_ignore_mask=None,
                   ignore_iof_thr=-1.0):
    """Vectorized MaxIoUAssigner for one image.

    candidates: (P, 4) xyxy; cand_valid: (P,) bool; gt_bboxes: (G, 4);
    gt_mask: (G,) bool.

    With ignore_iof_thr > 0 and crowd regions (gt_bboxes_ignore (Gi, 4) +
    gt_ignore_mask (Gi,)), candidates whose IoF with any crowd region
    exceeds the threshold become neither positive nor negative — their
    cls/reg weights end up 0 downstream (parity: reference
    max_iou_assigner.py:38-44, overlaps[:, crowd] = -1).
    """
    G = gt_bboxes.shape[0]
    overlaps = iou_xyxy(gt_bboxes, candidates)          # (G, P)
    eligible = gt_mask[:, None] & cand_valid[None, :]
    crowd = jnp.zeros(candidates.shape[:1], bool)
    if ignore_iof_thr > 0 and gt_bboxes_ignore is not None:
        iof = iof_xyxy(candidates, gt_bboxes_ignore)    # (P, Gi)
        iof = jnp.where(gt_ignore_mask[None, :], iof, -1.0)
        crowd = iof.max(axis=1) > ignore_iof_thr
        eligible = eligible & ~crowd[None, :]
    overlaps = jnp.where(eligible, overlaps, -1.0)

    max_iou = overlaps.max(axis=0)                      # (P,)
    argmax_gt = overlaps.argmax(axis=0)                 # (P,)
    pos = max_iou >= pos_iou_thr
    ignore = (max_iou >= neg_iou_thr) & (max_iou < pos_iou_thr)

    # step 3: each GT claims candidates tied at its own best IoU. The torch
    # loop runs in ascending GT order with later GTs overriding, so take the
    # *last* claiming GT per candidate (argmax of reversed first-match).
    gt_best = overlaps.max(axis=1)                      # (G,)
    claims = (overlaps == gt_best[:, None]) \
        & (gt_best[:, None] >= min_pos_iou) & eligible  # (G, P)
    gt_ids = jnp.arange(G)[:, None]
    last_claim = jnp.where(claims, gt_ids, -1).max(axis=0)  # (P,)
    claimed = last_claim >= 0

    assigned = jnp.where(claimed, last_claim, argmax_gt).astype(jnp.int32)
    pos_all = (pos | claimed) & cand_valid
    ignore = (ignore | crowd) & ~pos_all
    return IoUAssignment(assigned, pos_all, ignore, max_iou)
