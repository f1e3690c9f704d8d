"""Guided-anchoring targets, losses, and decode.

Parity surface: reference mmdet/core/anchor/guided_anchor_target.py
(ga_loc_target:32-131, ga_shape_target:134-230 with ApproxMaxIoUAssigner)
and mmdet/models/anchor_heads/guided_anchor_head.py (loss:394-505,
get_bboxes:506-611).

TPU-first reformulations:
- loc targets are computed as vectorized region masks (broadcasted iota
  comparisons reduced over padded GTs) instead of per-GT python slicing;
  center regions take priority over any GT's ignore band (the reference's
  sequential overwrite order can differ on overlapping instances).
- the Approx assigner's per-candidate IoU is the max over the octave's
  approx anchors, computed as one (G, P, A) IoU tensor.
- shape/cls/reg losses run on the padded square/guided-anchor sets with
  masks; the guided anchors feeding cls/reg are per-image tensors decoded
  from detached shape predictions (vmapped MaxIoU assignment).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.config import HeadConfig, TestConfig
from kgdet_tpu.core.bbox_transforms import bbox2delta, delta2bbox
from kgdet_tpu.core.iou_assign import assign_max_iou, iou_xyxy
from kgdet_tpu.ops.anchors import anchor_valid_flags, base_anchors, \
    grid_anchors
from kgdet_tpu.ops.losses import bounded_iou_loss, sigmoid_focal_loss, \
    smooth_l1_loss
from kgdet_tpu.ops.nms import multiclass_nms_kp

ANCHORING_STDS = (0.07, 0.07, 0.14, 0.14)


def ga_squares(stride, octave_base, fh, fw):
    """(P, 4) square anchors of side octave_base*stride per position."""
    base = base_anchors(octave_base * stride, [1.0], [1.0],
                        ctr=((stride - 1) / 2.0, (stride - 1) / 2.0))
    return grid_anchors(base, fh, fw, stride)


def ga_approx_anchors(stride, octave_base, scales_per_octave, ratios,
                      fh, fw):
    """(P, A, 4) octave approx anchors per position (retina layout)."""
    scales = [octave_base * 2 ** (i / scales_per_octave)
              for i in range(scales_per_octave)]
    base = base_anchors(stride, scales, ratios)
    A = base.shape[0]
    return grid_anchors(base, fh, fw, stride).reshape(-1, A, 4)


def _region_mask(boxes, fh, fw, ratio):
    """(G, fh, fw) mask of each box's ratio-shrunk center region
    (guided_anchor_target.py calc_region, feature-grid coords)."""
    x1 = jnp.clip(jnp.round((1 - ratio) * boxes[:, 0]
                            + ratio * boxes[:, 2]), 0, fw - 1)
    y1 = jnp.clip(jnp.round((1 - ratio) * boxes[:, 1]
                            + ratio * boxes[:, 3]), 0, fh - 1)
    x2 = jnp.clip(jnp.round(ratio * boxes[:, 0]
                            + (1 - ratio) * boxes[:, 2]), 0, fw - 1)
    y2 = jnp.clip(jnp.round(ratio * boxes[:, 1]
                            + (1 - ratio) * boxes[:, 3]), 0, fh - 1)
    ys = jnp.arange(fh)[None, :, None]
    xs = jnp.arange(fw)[None, None, :]
    return ((ys >= y1[:, None, None]) & (ys <= y2[:, None, None])
            & (xs >= x1[:, None, None]) & (xs <= x2[:, None, None]))


def ga_loc_targets(gt_bboxes, gt_mask, strides, featmap_sizes,
                   octave_base, center_ratio=0.2, ignore_ratio=0.5):
    """Per-level (B, fh, fw) loc targets + weights.

    positive (GT center region, own level): target 1, weight 1;
    ignore band (own level) and center/ignore of adjacent levels: weight 0;
    elsewhere: target 0, weight 0.1. Also returns the reference's
    loc_avg_factor = sum(B * fh * fw) / 200.
    """
    B, G = gt_mask.shape
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt(jnp.clip(
        (gt_bboxes[..., 2] - gt_bboxes[..., 0] + 1)
        * (gt_bboxes[..., 3] - gt_bboxes[..., 1] + 1), 1.0))
    min_size = float(octave_base * strides[0])
    lvl = jnp.clip(jnp.floor(jnp.log2(scale / min_size) + 0.5),
                   0, len(strides) - 1).astype(jnp.int32)     # (B, G)

    targets, weights = [], []
    for li, (stride, (fh, fw)) in enumerate(zip(strides, featmap_sizes)):
        boxes = gt_bboxes / stride

        def one(bx, m, lv):
            own = m & (lv == li)
            adj = m & ((lv == li - 1) | (lv == li + 1))
            ctr = _region_mask(bx, fh, fw, r1) & own[:, None, None]
            ign = _region_mask(bx, fh, fw, r2) & own[:, None, None]
            adj_ign = _region_mask(bx, fh, fw, r2) & adj[:, None, None]
            pos = ctr.any(axis=0)
            ignore = (ign.any(axis=0) | adj_ign.any(axis=0)) & ~pos
            t = pos.astype(jnp.float32)
            w = jnp.where(pos, 1.0, jnp.where(ignore, 0.0, 0.1))
            return t, w

        t, w = jax.vmap(one)(boxes, gt_mask, lvl)
        targets.append(t)
        weights.append(w)
    avg = sum(B * fh * fw for fh, fw in featmap_sizes) / 200.0
    return targets, weights, avg


def ga_loc_shape_losses(level_outs, batch, head_cfg: HeadConfig,
                        assign_cfg, canvas_hw, center_ratio=0.2,
                        ignore_ratio=0.5, anchoring_stds=ANCHORING_STDS,
                        shape_weight=0.2):
    """Shared GA branches: loc focal loss, bounded-IoU shape loss, and the
    decoded (detached) guided anchors + validity for downstream cls/reg.
    Returns (l_loc, l_shape, guided (B, P, 4), valid (B, P))."""
    strides = head_cfg.point_strides
    H, W = canvas_hw
    featmap_sizes = [(-(-H // s), -(-W // s)) for s in strides]
    B = batch['gt_bboxes'].shape[0]

    # ---------------------------------------------------------- loc branch
    loc_t, loc_w, loc_avg = ga_loc_targets(
        batch['gt_bboxes'], batch['gt_mask'], strides, featmap_sizes,
        head_cfg.octave_base_scale, center_ratio, ignore_ratio)
    l_loc = 0.0
    for o, t, w in zip(level_outs, loc_t, loc_w):
        logits = o['loc'][-1].astype(jnp.float32).reshape(B, -1, 1)
        l_loc += sigmoid_focal_loss(
            logits.reshape(-1, 1), t.reshape(-1).astype(jnp.int32),
            w.reshape(-1), gamma=head_cfg.focal_gamma,
            alpha=head_cfg.focal_alpha, avg_factor=loc_avg)

    # ---------------------------------------------- squares/approxs/shapes
    squares = jnp.concatenate(
        [ga_squares(s, head_cfg.octave_base_scale, fh, fw)
         for s, (fh, fw) in zip(strides, featmap_sizes)], axis=0)
    approxs = jnp.concatenate(
        [ga_approx_anchors(s, head_cfg.octave_base_scale,
                           head_cfg.scales_per_octave,
                           head_cfg.anchor_ratios, fh, fw)
         for s, (fh, fw) in zip(strides, featmap_sizes)], axis=0)
    valid = jnp.concatenate(
        [jax.vmap(lambda a, b, fh=fh, fw=fw: anchor_valid_flags(
            fh, fw, 1, a, b))(
            jnp.ceil(batch['valid_hw'][:, 0] / s).astype(jnp.int32),
            jnp.ceil(batch['valid_hw'][:, 1] / s).astype(jnp.int32))
         for s, (fh, fw) in zip(strides, featmap_sizes)], axis=1)
    shape_pred = jnp.concatenate(
        [o['shape'][-1].astype(jnp.float32).reshape(B, -1, 2)
         for o in level_outs], axis=1)                         # (B, P, 2)

    # Approx assignment: per-square IoU = max over its octave approxs
    def assign_one(v, gts, mask):
        iou = iou_xyxy(gts, approxs.reshape(-1, 4))            # (G, P*A)
        iou = iou.reshape(gts.shape[0], -1, approxs.shape[1]).max(-1)
        iou = jnp.where(mask[:, None] & v[None, :], iou, -1.0)
        max_iou = iou.max(axis=0)
        argmax = iou.argmax(axis=0)
        pos = max_iou >= assign_cfg.pos_iou_thr
        # each GT claims its best square (min_pos_iou)
        gt_best = iou.max(axis=1)
        claims = (iou == gt_best[:, None]) \
            & (gt_best[:, None] >= assign_cfg.min_pos_iou) \
            & mask[:, None] & v[None, :]
        last = jnp.where(claims, jnp.arange(gts.shape[0])[:, None],
                         -1).max(axis=0)
        assigned = jnp.where(last >= 0, last, argmax).astype(jnp.int32)
        return assigned, (pos | (last >= 0)) & v

    assigned, pos_mask = jax.vmap(assign_one)(
        valid, batch['gt_bboxes'], batch['gt_mask'])

    # shape loss: bounded IoU between decoded (square + dw/dh) and its GT
    deltas = jnp.concatenate(
        [jnp.zeros_like(shape_pred), shape_pred], axis=-1)
    pred_anchors = jax.vmap(
        lambda d: delta2bbox(squares, d, stds=anchoring_stds))(deltas)
    gt_per_sq = jnp.take_along_axis(
        batch['gt_bboxes'], assigned[..., None].repeat(4, -1), axis=1)
    posf = pos_mask.astype(jnp.float32)
    l_shape = bounded_iou_loss(
        pred_anchors, gt_per_sq, weights=posf[..., None], beta=0.2,
        avg_factor=jnp.maximum(posf.sum(), 1.0)) * shape_weight

    guided = jax.lax.stop_gradient(pred_anchors)               # (B, P, 4)
    return l_loc, l_shape, guided, valid


def ga_loss(level_outs: List[Dict], batch, head_cfg: HeadConfig,
            assign_cfg, canvas_hw, center_ratio=0.2, ignore_ratio=0.5,
            anchoring_stds=ANCHORING_STDS, target_stds=(1.0, 1.0, 1.0, 1.0),
            loc_weight=1.0, shape_weight=0.2):
    """Total GA loss: loc focal + bounded-IoU shape + focal cls +
    smooth-L1 reg on the guided anchors."""
    B = batch['gt_bboxes'].shape[0]
    l_loc, l_shape, guided, valid = ga_loc_shape_losses(
        level_outs, batch, head_cfg, assign_cfg, canvas_hw, center_ratio,
        ignore_ratio, anchoring_stds, shape_weight)
    cls = jnp.concatenate(
        [o['cls'][-1].astype(jnp.float32).reshape(
            B, -1, head_cfg.num_classes) for o in level_outs], axis=1)
    reg = jnp.concatenate(
        [o['bbox'][-1].astype(jnp.float32).reshape(B, -1, 4)
         for o in level_outs], axis=1)

    def targets_one(anc, v, gts, labels, mask, ign, ign_mask):
        a = assign_max_iou(anc, v, gts, mask,
                           pos_iou_thr=assign_cfg.pos_iou_thr,
                           neg_iou_thr=assign_cfg.neg_iou_thr,
                           min_pos_iou=assign_cfg.min_pos_iou,
                           gt_bboxes_ignore=ign, gt_ignore_mask=ign_mask,
                           ignore_iof_thr=getattr(
                               assign_cfg, 'ignore_iof_thr', -1.0))
        pf = a.pos_mask.astype(jnp.float32)
        lab = jnp.where(a.pos_mask, labels[a.assigned_gt], 0)
        lw = (v & ~a.ignore_mask).astype(jnp.float32)
        dl = bbox2delta(anc, gts[a.assigned_gt],
                        stds=target_stds) * pf[:, None]
        return (lab.astype(jnp.int32), lw, dl,
                jnp.broadcast_to(pf[:, None], dl.shape),
                jnp.maximum(a.pos_mask.sum().astype(jnp.int32), 1))

    if 'gt_bboxes_ignore' in batch:
        ign, ign_mask = batch['gt_bboxes_ignore'], batch['gt_ignore_mask']
    else:
        ign = jnp.zeros((B, 1, 4), jnp.float32)
        ign_mask = jnp.zeros((B, 1), bool)
    labels, label_w, deltas_t, bbox_w, num_pos = jax.vmap(targets_one)(
        guided, valid, batch['gt_bboxes'], batch['gt_labels'],
        batch['gt_mask'], ign, ign_mask)
    avg = jnp.sum(num_pos).astype(jnp.float32)
    l_cls = sigmoid_focal_loss(
        cls.reshape(-1, head_cfg.num_classes), labels.reshape(-1),
        label_w.reshape(-1), gamma=head_cfg.focal_gamma,
        alpha=head_cfg.focal_alpha, avg_factor=avg)
    l_bbox = smooth_l1_loss(
        reg.reshape(-1, 4), deltas_t.reshape(-1, 4), bbox_w.reshape(-1, 4),
        beta=head_cfg.smooth_l1_beta, avg_factor=avg)

    total = l_cls + l_bbox + loc_weight * l_loc + l_shape
    return total, {'loss_cls': l_cls, 'loss_bbox': l_bbox,
                   'loss_loc': l_loc, 'loss_shape': l_shape,
                   'num_pos': avg}


def decode_detections_ga(level_outs, head_cfg: HeadConfig, canvas_hw,
                         img_hw, scale_factor, cfg: TestConfig,
                         anchoring_stds=ANCHORING_STDS,
                         target_stds=(1.0, 1.0, 1.0, 1.0),
                         loc_filter_thr=0.01):
    """GA inference: guided anchors from shape preds, loc-filtered scores,
    delta decode + NMS (guided_anchor_head.py get_bboxes_single, with the
    loc filter as a score mask instead of a gather — fixed shapes)."""
    strides = head_cfg.point_strides
    H, W = canvas_hw
    num_classes = head_cfg.num_classes
    B = level_outs[0]['cls'].shape[1]
    mlvl_scores, mlvl_bboxes = [], []
    for o, s in zip(level_outs, strides):
        fh, fw = -(-H // s), -(-W // s)
        squares = ga_squares(s, head_cfg.octave_base_scale, fh, fw)
        P = squares.shape[0]
        shape_pred = o['shape'][-1].astype(jnp.float32).reshape(B, P, 2)
        loc = jax.nn.sigmoid(
            o['loc'][-1].astype(jnp.float32).reshape(B, P))
        deltas = jnp.concatenate(
            [jnp.zeros_like(shape_pred), shape_pred], axis=-1)
        guided = jax.vmap(
            lambda d: delta2bbox(squares, d, stds=anchoring_stds))(deltas)
        scores = jax.nn.sigmoid(
            o['cls'][-1].astype(jnp.float32).reshape(B, P, num_classes))
        scores = jnp.where((loc >= loc_filter_thr)[..., None], scores, 0.0)
        reg = o['bbox'][-1].astype(jnp.float32).reshape(B, P, 4)
        if cfg.nms_pre > 0 and P > cfg.nms_pre:
            _, topk = jax.lax.top_k(scores.max(-1), cfg.nms_pre)
            take = lambda t: jnp.take_along_axis(t, topk[..., None], axis=1)
            scores, reg, guided = take(scores), take(reg), take(guided)
        boxes = delta2bbox(guided, reg, stds=target_stds)
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

    def nms_one(b, sc, k):
        return multiclass_nms_kp(
            b, sc, k, cfg.score_thr, cfg.nms_iou_thr,
            max_per_class=cfg.max_per_class, max_per_img=cfg.max_per_img,
            nms_type=cfg.nms_type, soft_sigma=cfg.soft_nms_sigma,
            soft_min_score=cfg.soft_nms_min_score)

    det_bboxes, det_labels, det_kpts, valid = jax.vmap(nms_one)(
        boxes, scores, dummy_kpts)
    return {'det_bboxes': det_bboxes, 'det_labels': det_labels,
            'det_kpts': det_kpts, 'valid': valid}


GA_RPN_TARGET_STDS = (0.07, 0.07, 0.11, 0.11)


def ga_rpn_loss(level_outs, batch, head_cfg: HeadConfig, assign_cfg,
                canvas_hw, rng, num_samples=256, pos_fraction=0.5,
                pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                target_stds=GA_RPN_TARGET_STDS):
    """GA-RPN loss: shared loc/shape branches + binary objectness and
    class-agnostic regression on the guided anchors with RPN-style
    subsampling (parity: ga_rpn_head.py:35-58)."""
    from kgdet_tpu.core.two_stage_loss import bce_loss, sample_pos_neg

    B = batch['gt_bboxes'].shape[0]
    l_loc, l_shape, guided, valid = ga_loc_shape_losses(
        level_outs, batch, head_cfg, assign_cfg, canvas_hw)

    cls = jnp.concatenate(
        [o['cls'][-1].astype(jnp.float32).reshape(B, -1)
         for o in level_outs], axis=1)
    reg = jnp.concatenate(
        [o['bbox'][-1].astype(jnp.float32).reshape(B, -1, 4)
         for o in level_outs], axis=1)

    def single(key, anc, v, gts, mask):
        a = assign_max_iou(anc, v, gts, mask, pos_iou_thr, neg_iou_thr,
                           min_pos_iou)
        neg = v & ~a.pos_mask & ~a.ignore_mask
        pos_sel, neg_sel = sample_pos_neg(
            key, a.pos_mask, neg, num_samples, pos_fraction)
        cls_t = pos_sel.astype(jnp.float32)
        cls_w = (pos_sel | neg_sel).astype(jnp.float32)
        deltas = bbox2delta(anc, gts[a.assigned_gt], stds=target_stds)
        reg_w = pos_sel.astype(jnp.float32)[:, None]
        return cls_t, cls_w, deltas, reg_w

    keys = jax.random.split(rng, B)
    cls_t, cls_w, deltas, reg_w = jax.vmap(single)(
        keys, guided, valid, batch['gt_bboxes'], batch['gt_mask'])
    avg = cls_w.sum()
    l_cls = bce_loss(cls, cls_t, cls_w, avg)
    l_reg = smooth_l1_loss(reg, deltas, reg_w, beta=1.0 / 9.0,
                           avg_factor=jnp.maximum(avg, 1.0))
    total = l_cls + l_reg + l_loc + l_shape
    return total, {'loss_rpn_cls': l_cls, 'loss_rpn_bbox': l_reg,
                   'loss_anchor_loc': l_loc, 'loss_anchor_shape': l_shape}


def ga_rpn_proposals(level_outs, head_cfg: HeadConfig, canvas_hw, img_hw,
                     nms_pre=1000, max_num=1000, nms_thr=0.7,
                     min_bbox_size=0.0, loc_filter_thr=0.01,
                     anchoring_stds=ANCHORING_STDS,
                     target_stds=GA_RPN_TARGET_STDS):
    """Decode GA-RPN outputs into fixed-size padded proposals (loc-filtered
    guided anchors + deltas, per-level top-k, one greedy NMS).

    Parity: ga_rpn_head.py get_bboxes_single, with the loc filter expressed
    as a score mask instead of a gather (fixed shapes).
    """
    from kgdet_tpu.ops.nms import NEG_INF, greedy_nms

    strides = head_cfg.point_strides
    H, W = canvas_hw
    B = level_outs[0]['cls'].shape[1]
    lvl_boxes, lvl_scores = [], []
    for o, s in zip(level_outs, strides):
        fh, fw = -(-H // s), -(-W // s)
        squares = ga_squares(s, head_cfg.octave_base_scale, fh, fw)
        P = squares.shape[0]
        shape_pred = o['shape'][-1].astype(jnp.float32).reshape(B, P, 2)
        loc = jax.nn.sigmoid(o['loc'][-1].astype(jnp.float32).reshape(B, P))
        deltas0 = jnp.concatenate(
            [jnp.zeros_like(shape_pred), shape_pred], axis=-1)
        guided = jax.vmap(
            lambda d: delta2bbox(squares, d, stds=anchoring_stds))(deltas0)
        scores = jax.nn.sigmoid(
            o['cls'][-1].astype(jnp.float32).reshape(B, P))
        scores = jnp.where(loc >= loc_filter_thr, scores, 0.0)
        reg = o['bbox'][-1].astype(jnp.float32).reshape(B, P, 4)
        k = min(nms_pre, P)
        top_scores, topk = jax.lax.top_k(scores, k)
        take = lambda t: jnp.take_along_axis(t, topk[..., None], axis=1)
        boxes = delta2bbox(take(guided), take(reg), stds=target_stds)
        w = img_hw[:, 1][:, None]
        h = img_hw[:, 0][:, None]
        boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                           jnp.clip(boxes[..., 1], 0, h),
                           jnp.clip(boxes[..., 2], 0, w),
                           jnp.clip(boxes[..., 3], 0, h)], axis=-1)
        ok = ((boxes[..., 2] - boxes[..., 0] > min_bbox_size)
              & (boxes[..., 3] - boxes[..., 1] > min_bbox_size))
        lvl_scores.append(jnp.where(ok, top_scores, NEG_INF))
        lvl_boxes.append(boxes)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)

    def one(b, sc):
        keep_idx, keep_scores = greedy_nms(b, sc, nms_thr, max_num)
        ok = keep_scores > NEG_INF / 2
        safe = jnp.clip(keep_idx, 0, b.shape[0] - 1)
        return (jnp.where(ok[:, None], b[safe], 0),
                jnp.where(ok, keep_scores, 0), ok)

    return jax.vmap(one)(boxes, scores)
