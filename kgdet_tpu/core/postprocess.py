"""Inference decoding + on-device NMS -> fixed-size padded detections.

Pipeline per image (stage-3 outputs only): per-level top-``nms_pre`` by max
class score -> decode points to image coordinates -> clamp to the resized
image shape -> rescale to original coordinates -> pad keypoint visibility=1
-> multiclass NMS carrying keypoints -> global top-``max_per_img``.
Everything runs under jit with static shapes; only the final padded arrays
leave the device.

Parity reference: /root/reference/mmdetection/mmdet/models/anchor_heads/
reppoints_head_kp3rep_cas_1_assign_once.py:770-914 and
mmdet/core/post_processing/bbox_nms_kp.py.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.config import TestConfig
from kgdet_tpu.ops.nms import multiclass_nms_kp
from kgdet_tpu.ops.points import offsets_to_coords, yx_to_xy


def decode_raw(level_outs: List[Dict], level_points: Sequence,
               img_hw, scale_factor, cfg: TestConfig,
               num_keypts: int = 294):
    """Per-level top-k decode to original-image coordinates, NO NMS.

    Returns (bboxes (B, N, 4), scores (B, N, C), kpts (B, N, K*3)) — the
    reference's pre-NMS mlvl tensors (get_bboxes_single:825-890), exposed
    separately so test-time augmentation can merge raw boxes across aug
    variants before a single NMS (aug_test semantics,
    reppoints_detector_kp.py:118-148).
    """
    mlvl_scores, mlvl_bboxes, mlvl_kpts = [], [], []
    B = level_outs[0]['cls'].shape[1]
    for outs, points in zip(level_outs, level_points):
        stride = points[0, 2]
        centers = points[:, :2]
        P = centers.shape[0]
        cls = outs['cls'][-1].astype(jnp.float32).reshape(B, P, -1)
        scores = jax.nn.sigmoid(cls)
        bbox = outs['bbox'][-1].astype(jnp.float32).reshape(B, P, 4)
        kpt = outs['kpt'][-1].astype(jnp.float32).reshape(B, P, -1)

        if cfg.nms_pre > 0 and P > cfg.nms_pre:
            max_scores = scores.max(axis=-1)                     # (B, P)
            _, topk = jax.lax.top_k(max_scores, cfg.nms_pre)     # (B, pre)
            take = lambda t: jnp.take_along_axis(
                t, topk[..., None], axis=1)
            scores = take(scores)
            bbox = take(bbox)
            kpt = take(kpt)
            ctr = jnp.broadcast_to(centers[None], (B, P, 2))
            centers_b = jnp.take_along_axis(ctr, topk[..., None], axis=1)
        else:
            centers_b = jnp.broadcast_to(centers[None], (B, P, 2))

        n = bbox.shape[1]
        bbox_ctr = jnp.concatenate([centers_b, centers_b], axis=-1)
        bboxes = bbox * stride + bbox_ctr
        # clamp to the per-image resized extent
        w = img_hw[:, 1][:, None]
        h = img_hw[:, 0][:, None]
        x1 = jnp.clip(bboxes[..., 0], 0, w)
        y1 = jnp.clip(bboxes[..., 1], 0, h)
        x2 = jnp.clip(bboxes[..., 2], 0, w)
        y2 = jnp.clip(bboxes[..., 3], 0, h)
        bboxes = jnp.stack([x1, y1, x2, y2], axis=-1)

        kpt_xy = yx_to_xy(kpt).reshape(B, n, num_keypts, 2)
        kpt_xy = kpt_xy * stride + centers_b[:, :, None, :]
        kx = jnp.clip(kpt_xy[..., 0], 0, w[..., None])
        ky = jnp.clip(kpt_xy[..., 1], 0, h[..., None])
        kpts = jnp.stack([kx, ky, jnp.ones_like(kx)], axis=-1)

        mlvl_scores.append(scores)
        mlvl_bboxes.append(bboxes)
        mlvl_kpts.append(kpts)

    scores = jnp.concatenate(mlvl_scores, axis=1)
    bboxes = jnp.concatenate(mlvl_bboxes, axis=1)
    kpts = jnp.concatenate(mlvl_kpts, axis=1)

    # rescale to original-image coordinates
    sf = scale_factor[:, None, None]
    bboxes = bboxes / sf
    kpts = kpts.at[..., :2].set(kpts[..., :2] / sf[..., None])
    kpts = kpts.reshape(B, kpts.shape[1], num_keypts * 3)
    return bboxes, scores, kpts


def nms_detections(bboxes, scores, kpts, cfg: TestConfig):
    """Batched multiclass NMS over raw decoded tensors -> padded dets."""
    def nms_one(b, s, k):
        return multiclass_nms_kp(
            b, s, k, cfg.score_thr, cfg.nms_iou_thr,
            max_per_class=cfg.max_per_class, max_per_img=cfg.max_per_img,
            nms_type=cfg.nms_type, soft_sigma=cfg.soft_nms_sigma,
            soft_min_score=cfg.soft_nms_min_score)

    det_bboxes, det_labels, det_kpts, valid = jax.vmap(nms_one)(
        bboxes, scores, kpts)
    return {
        'det_bboxes': det_bboxes,
        'det_labels': det_labels,
        'det_kpts': det_kpts,
        'valid': valid,
    }


def decode_detections(level_outs: List[Dict], level_points: Sequence,
                      img_hw, scale_factor, cfg: TestConfig,
                      num_keypts: int = 294):
    """Decode head outputs into padded per-image detections.

    level_outs: per-level dicts ('cls'/'kpt'/'bbox', stacked (3, B, ...)).
    img_hw: (B, 2) resized (pre-pad) image extents for clamping.
    scale_factor: (B,) resize factor (original -> resized).

    Returns dict with det_bboxes (B, M, 5), det_labels (B, M),
    det_kpts (B, M, K*3), valid (B, M).
    """
    bboxes, scores, kpts = decode_raw(
        level_outs, level_points, img_hw, scale_factor, cfg, num_keypts)
    return nms_detections(bboxes, scores, kpts, cfg)


def detections_to_per_class(dets, num_classes=13):
    """Host-side: padded device detections -> per-class numpy result tuples.

    Returns a list (per image) of (bboxes_per_class, labels..., kpts_per_class)
    matching the reference's bbox2result_kp layout
    (reppoints_detector_kp.py:55-78).
    """
    out = []
    det_bboxes = np.asarray(dets['det_bboxes'])
    det_labels = np.asarray(dets['det_labels'])
    det_kpts = np.asarray(dets['det_kpts'])
    valid = np.asarray(dets['valid'])
    for b in range(det_bboxes.shape[0]):
        v = valid[b]
        bb, ll, kk = det_bboxes[b][v], det_labels[b][v], det_kpts[b][v]
        bbox_list = [bb[ll == c] for c in range(num_classes)]
        kpt_list = [kk[ll == c] for c in range(num_classes)]
        score_list = [bb[ll == c][:, 4] for c in range(num_classes)]
        out.append((bbox_list, score_list, kpt_list))
    return out
