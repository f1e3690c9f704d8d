"""Anchor-based head training loss + inference decoding (RetinaNet family).

Targets: MaxIoU assignment over the concatenated multi-level anchor set,
delta-encoded regression (parity: mmdet anchor_target.py + anchor_head.loss);
inference: per-level top-k, delta decode, multi-class NMS (anchor_head
get_bboxes). Everything fixed-shape and jit-safe.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from kgdet_tpu.config import HeadConfig, TestConfig
from kgdet_tpu.core.bbox_transforms import bbox2delta, delta2bbox
from kgdet_tpu.core.iou_assign import assign_max_iou
from kgdet_tpu.ops.losses import sigmoid_focal_loss, smooth_l1_loss
from kgdet_tpu.ops.nms import multiclass_nms_kp


def anchor_targets(anchors, anchor_valid, gt_bboxes, gt_labels, gt_mask,
                   pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0,
                   gt_bboxes_ignore=None, gt_ignore_mask=None,
                   ignore_iof_thr=-1.0):
    """Batched anchor targets over the concatenated anchor set.

    anchors: (P, 4); anchor_valid: (B, P); gts as usual (B, G, ...).
    Returns (labels (B,P), label_weights, deltas (B,P,4), bbox_weights,
    num_pos (B,)). Anchors inside crowd regions (IoF > ignore_iof_thr) get
    zero label weight (reference anchor_target.py + max_iou_assigner.py
    ignore path).
    """
    if gt_bboxes_ignore is None:
        B = gt_bboxes.shape[0]
        gt_bboxes_ignore = jnp.zeros((B, 1, 4), jnp.float32)
        gt_ignore_mask = jnp.zeros((B, 1), bool)

    def single(valid, bboxes, labels, mask, ign, ign_mask):
        a = assign_max_iou(anchors, valid, bboxes, mask,
                           pos_iou_thr, neg_iou_thr, min_pos_iou,
                           gt_bboxes_ignore=ign, gt_ignore_mask=ign_mask,
                           ignore_iof_thr=ignore_iof_thr)
        posf = a.pos_mask.astype(jnp.float32)
        labels_out = jnp.where(a.pos_mask, labels[a.assigned_gt], 0)
        label_weights = (valid & ~a.ignore_mask).astype(jnp.float32)
        deltas = bbox2delta(anchors, bboxes[a.assigned_gt]) * posf[:, None]
        bbox_weights = jnp.broadcast_to(posf[:, None], deltas.shape)
        num_pos = jnp.maximum(a.pos_mask.sum().astype(jnp.int32), 1)
        return (labels_out.astype(jnp.int32), label_weights, deltas,
                bbox_weights, num_pos)

    return jax.vmap(single)(anchor_valid, gt_bboxes, gt_labels, gt_mask,
                            gt_bboxes_ignore, gt_ignore_mask)


def retina_loss(level_outs: List[Dict], anchors_per_level: Sequence,
                valids_per_level: Sequence, batch, head_cfg: HeadConfig,
                assign_cfg):
    """Focal cls + smooth-L1 delta regression over all levels."""
    num_classes = head_cfg.num_classes
    anchors = jnp.concatenate(
        [jnp.asarray(a) for a in anchors_per_level], axis=0)
    valid = jnp.concatenate(list(valids_per_level), axis=1)
    labels, label_w, deltas, bbox_w, num_pos = anchor_targets(
        anchors, valid, batch['gt_bboxes'], batch['gt_labels'],
        batch['gt_mask'], pos_iou_thr=assign_cfg.pos_iou_thr,
        neg_iou_thr=assign_cfg.neg_iou_thr,
        min_pos_iou=assign_cfg.min_pos_iou,
        gt_bboxes_ignore=batch.get('gt_bboxes_ignore'),
        gt_ignore_mask=batch.get('gt_ignore_mask'),
        ignore_iof_thr=getattr(assign_cfg, 'ignore_iof_thr', -1.0))
    avg = jnp.sum(num_pos).astype(jnp.float32)

    cls = jnp.concatenate(
        [o['cls'][-1].astype(jnp.float32).reshape(
            o['cls'].shape[1], -1, num_classes) for o in level_outs], axis=1)
    reg = jnp.concatenate(
        [o['bbox'][-1].astype(jnp.float32).reshape(
            o['bbox'].shape[1], -1, 4) for o in level_outs], axis=1)

    l_cls = sigmoid_focal_loss(
        cls.reshape(-1, num_classes), labels.reshape(-1),
        label_w.reshape(-1), gamma=head_cfg.focal_gamma,
        alpha=head_cfg.focal_alpha, avg_factor=avg)
    l_bbox = smooth_l1_loss(
        reg.reshape(-1, 4), deltas.reshape(-1, 4), bbox_w.reshape(-1, 4),
        beta=head_cfg.smooth_l1_beta, avg_factor=avg)
    total = l_cls + l_bbox
    return total, {'loss_cls': l_cls, 'loss_bbox': l_bbox,
                   'num_pos': avg}


def decode_detections_anchor(level_outs, anchors_per_level, img_hw,
                             scale_factor, cfg: TestConfig,
                             num_classes: int):
    """Anchor-head inference: top-k, delta decode, clamp, rescale, NMS."""
    mlvl_scores, mlvl_bboxes = [], []
    B = level_outs[0]['cls'].shape[1]
    for outs, anchors in zip(level_outs, anchors_per_level):
        anchors = jnp.asarray(anchors)
        P = anchors.shape[0]
        scores = jax.nn.sigmoid(
            outs['cls'][-1].astype(jnp.float32).reshape(B, P, num_classes))
        reg = outs['bbox'][-1].astype(jnp.float32).reshape(B, P, 4)
        anc = jnp.broadcast_to(anchors[None], (B, P, 4))
        if cfg.nms_pre > 0 and P > cfg.nms_pre:
            max_scores = scores.max(axis=-1)
            _, topk = jax.lax.top_k(max_scores, cfg.nms_pre)
            take = lambda t: jnp.take_along_axis(
                t, topk[..., None], axis=1)
            scores, reg, anc = take(scores), take(reg), take(anc)
        boxes = delta2bbox(anc, reg)
        w = img_hw[:, 1][:, None]
        h = img_hw[:, 0][:, None]
        boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                           jnp.clip(boxes[..., 1], 0, h),
                           jnp.clip(boxes[..., 2], 0, w),
                           jnp.clip(boxes[..., 3], 0, h)], axis=-1)
        mlvl_scores.append(scores)
        mlvl_bboxes.append(boxes)

    scores = jnp.concatenate(mlvl_scores, axis=1)
    boxes = jnp.concatenate(mlvl_bboxes, axis=1) / scale_factor[:, None, None]
    dummy_kpts = jnp.zeros((B, boxes.shape[1], 3), boxes.dtype)

    def nms_one(b, s, k):
        return multiclass_nms_kp(
            b, s, k, cfg.score_thr, cfg.nms_iou_thr,
            max_per_class=cfg.max_per_class, max_per_img=cfg.max_per_img,
            nms_type=cfg.nms_type, soft_sigma=cfg.soft_nms_sigma,
            soft_min_score=cfg.soft_nms_min_score)

    det_bboxes, det_labels, det_kpts, valid = jax.vmap(nms_one)(
        boxes, scores, dummy_kpts)
    return {'det_bboxes': det_bboxes, 'det_labels': det_labels,
            'det_kpts': det_kpts, 'valid': valid}


def ssd_loss(level_outs, anchors_per_level, valids_per_level, batch,
             head_cfg: HeadConfig, assign_cfg, neg_pos_ratio: int = 3,
             target_stds=(0.1, 0.1, 0.2, 0.2)):
    """SSD MultiBox loss: softmax CE with 3:1 hard-negative mining +
    smooth-L1 deltas.

    Parity: reference ssd_head.py loss_single — negatives are ranked by
    their background CE loss per image and the top neg_pos_ratio*num_pos
    are kept; both terms normalize by the batch positive count. The
    reference's dynamic topk becomes a fixed-shape rank-vs-count compare.
    """
    num_classes = head_cfg.num_classes
    C1 = num_classes + 1
    anchors = jnp.concatenate(
        [jnp.asarray(a) for a in anchors_per_level], axis=0)
    valid = jnp.concatenate(list(valids_per_level), axis=1)
    B = valid.shape[0]

    labels, label_w, deltas, bbox_w, _ = anchor_targets(
        anchors, valid, batch['gt_bboxes'], batch['gt_labels'],
        batch['gt_mask'], pos_iou_thr=assign_cfg.pos_iou_thr,
        neg_iou_thr=assign_cfg.neg_iou_thr,
        min_pos_iou=assign_cfg.min_pos_iou,
        gt_bboxes_ignore=batch.get('gt_bboxes_ignore'),
        gt_ignore_mask=batch.get('gt_ignore_mask'),
        ignore_iof_thr=getattr(assign_cfg, 'ignore_iof_thr', -1.0))
    cls = jnp.concatenate(
        [o['cls'][-1].astype(jnp.float32).reshape(o['cls'].shape[1], -1, C1)
         for o in level_outs], axis=1)
    reg = jnp.concatenate(
        [o['bbox'][-1].astype(jnp.float32).reshape(
            o['bbox'].shape[1], -1, 4) for o in level_outs], axis=1)

    logp = jax.nn.log_softmax(cls, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    ce = ce * label_w                                       # (B, P)

    pos = (labels > 0) & (label_w > 0)
    neg = (labels == 0) & (label_w > 0)
    num_pos_img = pos.sum(axis=1)                           # (B,)
    # per-image hard-negative rank (descending CE)
    neg_ce = jnp.where(neg, ce, -jnp.inf)
    order = jnp.argsort(-neg_ce, axis=1)
    P = ce.shape[1]
    rank = jnp.zeros_like(order).at[
        jnp.arange(B)[:, None], order].set(jnp.arange(P)[None, :])
    sel_neg = neg & (rank < (neg_pos_ratio * num_pos_img)[:, None])

    total_pos = jnp.maximum(num_pos_img.sum().astype(jnp.float32), 1.0)
    l_cls = (ce * (pos | sel_neg)).sum() / total_pos

    # smooth-L1 on std-scaled delta targets (bbox_w marks positives;
    # anchor_targets built raw deltas, SSD trains against deltas / stds)
    deltas_std = deltas / jnp.asarray(target_stds, jnp.float32)
    l_bbox = smooth_l1_loss(reg, deltas_std, bbox_w, beta=1.0,
                            avg_factor=total_pos)
    total = l_cls + l_bbox
    return total, {'loss_cls': l_cls, 'loss_bbox': l_bbox,
                   'num_pos': total_pos}


def decode_detections_ssd(level_outs, anchors_per_level, img_hw,
                          scale_factor, cfg: TestConfig, num_classes: int,
                          target_stds=(0.1, 0.1, 0.2, 0.2)):
    """SSD inference: per-level softmax scores (background dropped),
    std-scaled delta decode, clamp, rescale, NMS."""
    C1 = num_classes + 1
    mlvl_scores, mlvl_bboxes = [], []
    B = level_outs[0]['cls'].shape[1]
    for outs, anchors in zip(level_outs, anchors_per_level):
        anchors = jnp.asarray(anchors)
        P = anchors.shape[0]
        scores = jax.nn.softmax(
            outs['cls'][-1].astype(jnp.float32).reshape(B, P, C1),
            axis=-1)[..., 1:]
        reg = outs['bbox'][-1].astype(jnp.float32).reshape(B, P, 4)
        anc = jnp.broadcast_to(anchors[None], (B, P, 4))
        if cfg.nms_pre > 0 and P > cfg.nms_pre:
            max_scores = scores.max(axis=-1)
            _, topk = jax.lax.top_k(max_scores, cfg.nms_pre)
            take = lambda t: jnp.take_along_axis(t, topk[..., None], axis=1)
            scores, reg, anc = take(scores), take(reg), take(anc)
        boxes = delta2bbox(anc, reg, stds=target_stds)
        w = img_hw[:, 1][:, None]
        h = img_hw[:, 0][:, None]
        boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                           jnp.clip(boxes[..., 1], 0, h),
                           jnp.clip(boxes[..., 2], 0, w),
                           jnp.clip(boxes[..., 3], 0, h)], axis=-1)
        mlvl_scores.append(scores)
        mlvl_bboxes.append(boxes)

    scores = jnp.concatenate(mlvl_scores, axis=1)
    boxes = jnp.concatenate(mlvl_bboxes, axis=1) / scale_factor[:, None, None]
    dummy_kpts = jnp.zeros((B, boxes.shape[1], 3), boxes.dtype)

    def nms_one(b, s, k):
        return multiclass_nms_kp(
            b, s, k, cfg.score_thr, cfg.nms_iou_thr,
            max_per_class=cfg.max_per_class, max_per_img=cfg.max_per_img,
            nms_type=cfg.nms_type, soft_sigma=cfg.soft_nms_sigma,
            soft_min_score=cfg.soft_nms_min_score)

    det_bboxes, det_labels, det_kpts, valid = jax.vmap(nms_one)(
        boxes, scores, dummy_kpts)
    return {'det_bboxes': det_bboxes, 'det_labels': det_labels,
            'det_kpts': det_kpts, 'valid': valid}
