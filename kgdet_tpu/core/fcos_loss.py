"""FCOS target assignment, loss, and inference decoding (vectorized).

Parity: mmdet fcos_head.py — points inside a GT box regress its (l, t, r, b)
distances; pyramid levels partition GTs by max-distance regress ranges;
ambiguous points take the minimum-area GT; centerness-weighted IoU loss.
The per-image python target loop becomes a (G, P) matrix program.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from kgdet_tpu.config import HeadConfig, TestConfig
from kgdet_tpu.core.bbox_transforms import distance2bbox
from kgdet_tpu.ops.losses import iou_loss, sigmoid_focal_loss
from kgdet_tpu.ops.nms import multiclass_nms_kp

INF = 1e8
REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))


def regress_ranges_for(num_levels: int):
    """First num_levels ranges with the last upper bound opened to INF."""
    r = [list(x) for x in REGRESS_RANGES[:num_levels]]
    r[-1][1] = INF
    return [tuple(x) for x in r]


def fcos_targets(points, ranges, valid, gt_bboxes, gt_labels, gt_mask):
    """Per-point labels + (l, t, r, b) distances for one image.

    points: (P, 3) (x, y, stride); ranges: (P, 2) per-point regress range.
    """
    P = points.shape[0]
    xs = points[:, 0][None]               # (1, P)
    ys = points[:, 1][None]
    l = xs - gt_bboxes[:, 0:1]            # (G, P)
    t = ys - gt_bboxes[:, 1:2]
    r = gt_bboxes[:, 2:3] - xs
    b = gt_bboxes[:, 3:4] - ys
    dists = jnp.stack([l, t, r, b], axis=-1)          # (G, P, 4)
    inside = dists.min(axis=-1) > 0
    max_dist = dists.max(axis=-1)
    in_range = (max_dist >= ranges[None, :, 0]) & \
               (max_dist <= ranges[None, :, 1])
    areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) * \
            (gt_bboxes[:, 3] - gt_bboxes[:, 1])
    eligible = inside & in_range & gt_mask[:, None] & valid[None]
    area_mat = jnp.where(eligible, areas[:, None], INF)
    assigned = jnp.argmin(area_mat, axis=0)            # (P,)
    pos = area_mat.min(axis=0) < INF / 2
    labels = jnp.where(pos, gt_labels[assigned], 0)
    tgt_dists = jnp.take_along_axis(
        dists, assigned[None, :, None].repeat(4, -1), axis=0)[0]  # (P, 4)
    lr = tgt_dists[:, [0, 2]]
    tb = tgt_dists[:, [1, 3]]
    ctr = jnp.sqrt(jnp.clip(
        (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6)) *
        (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)), 0, None))
    return (labels.astype(jnp.int32), pos,
            tgt_dists * pos[:, None], ctr * pos)


def fcos_loss(level_outs: List[Dict], level_points: Sequence, valids,
              batch, head_cfg: HeadConfig):
    """Focal cls + centerness-weighted IoU + BCE centerness over all levels."""
    num_classes = head_cfg.num_classes
    points = jnp.concatenate([jnp.asarray(p) for p in level_points], axis=0)
    rr = regress_ranges_for(len(level_points))
    ranges = jnp.concatenate([
        jnp.tile(jnp.asarray(rr[i], jnp.float32), (p.shape[0], 1))
        for i, p in enumerate(level_points)], axis=0)
    valid = jnp.concatenate(list(valids), axis=1)

    labels, pos, tgt_dists, tgt_ctr = jax.vmap(
        lambda v, gb, gl, gm: fcos_targets(points, ranges, v, gb, gl, gm)
    )(valid, batch['gt_bboxes'], batch['gt_labels'], batch['gt_mask'])

    B = labels.shape[0]
    cls = jnp.concatenate(
        [o['cls'][-1].astype(jnp.float32).reshape(B, -1, num_classes)
         for o in level_outs], axis=1)
    dist = jnp.concatenate(
        [o['bbox'][-1].astype(jnp.float32).reshape(B, -1, 4)
         for o in level_outs], axis=1)
    ctr = jnp.concatenate(
        [o['centerness'][-1].astype(jnp.float32).reshape(B, -1)
         for o in level_outs], axis=1)

    num_pos = jnp.maximum(pos.sum(), 1).astype(jnp.float32)
    l_cls = sigmoid_focal_loss(
        cls.reshape(-1, num_classes), labels.reshape(-1),
        valid.reshape(-1).astype(jnp.float32),
        gamma=head_cfg.focal_gamma, alpha=head_cfg.focal_alpha,
        avg_factor=num_pos)

    pts_xy = points[None, :, :2]
    boxes_pred = distance2bbox(pts_xy, dist)
    boxes_tgt = distance2bbox(pts_xy, tgt_dists)
    posf = pos.astype(jnp.float32)
    ctr_sum = jnp.maximum((tgt_ctr * posf).sum(), 1e-6)
    l_bbox = iou_loss(boxes_pred.reshape(-1, 4), boxes_tgt.reshape(-1, 4),
                      (tgt_ctr * posf).reshape(-1),
                      avg_factor=ctr_sum)

    bce = jnp.clip(ctr, 0, None) - ctr * tgt_ctr + jnp.log1p(
        jnp.exp(-jnp.abs(ctr)))
    l_ctr = (bce * posf).sum() / num_pos

    total = l_cls + l_bbox + l_ctr
    return total, {'loss_cls': l_cls, 'loss_bbox': l_bbox,
                   'loss_centerness': l_ctr, 'num_pos': num_pos}


def decode_detections_fcos(level_outs, level_points, img_hw, scale_factor,
                           cfg: TestConfig, num_classes: int):
    """Centerness-weighted scores, distance decode, NMS."""
    mlvl_scores, mlvl_boxes = [], []
    B = level_outs[0]['cls'].shape[1]
    for outs, pts in zip(level_outs, level_points):
        pts = jnp.asarray(pts)
        P = pts.shape[0]
        scores = jax.nn.sigmoid(
            outs['cls'][-1].astype(jnp.float32).reshape(B, P, num_classes))
        ctr = jax.nn.sigmoid(
            outs['centerness'][-1].astype(jnp.float32).reshape(B, P, 1))
        scores = scores * ctr
        dist = outs['bbox'][-1].astype(jnp.float32).reshape(B, P, 4)
        xy = jnp.broadcast_to(pts[None, :, :2], (B, P, 2))
        if cfg.nms_pre > 0 and P > cfg.nms_pre:
            max_scores = scores.max(axis=-1)
            _, topk = jax.lax.top_k(max_scores, cfg.nms_pre)
            take = lambda tns: jnp.take_along_axis(
                tns, topk[..., None], axis=1)
            scores, dist, xy = take(scores), take(dist), take(xy)
        boxes = distance2bbox(xy, dist)
        w = img_hw[:, 1][:, None]
        h = img_hw[:, 0][:, None]
        boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                           jnp.clip(boxes[..., 1], 0, h),
                           jnp.clip(boxes[..., 2], 0, w),
                           jnp.clip(boxes[..., 3], 0, h)], axis=-1)
        mlvl_scores.append(scores)
        mlvl_boxes.append(boxes)

    scores = jnp.concatenate(mlvl_scores, axis=1)
    boxes = jnp.concatenate(mlvl_boxes, axis=1) / scale_factor[:, None, None]
    dummy_kpts = jnp.zeros((B, boxes.shape[1], 3), boxes.dtype)

    def nms_one(b, s, k):
        return multiclass_nms_kp(
            b, s, k, cfg.score_thr, cfg.nms_iou_thr,
            max_per_class=cfg.max_per_class, max_per_img=cfg.max_per_img,
            nms_type=cfg.nms_type)

    det_bboxes, det_labels, det_kpts, valid = jax.vmap(nms_one)(
        boxes, scores, dummy_kpts)
    return {'det_bboxes': det_bboxes, 'det_labels': det_labels,
            'det_kpts': det_kpts, 'valid': valid}
