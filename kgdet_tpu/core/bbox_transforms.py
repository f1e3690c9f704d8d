"""Box coordinate transforms (delta coding, RoI packing, distance coding).

Parity reference: /root/reference/mmdetection/mmdet/core/bbox/transforms.py
(bbox2delta:6, delta2bbox:34, bbox_flip:71, bbox_mapping:85,
bbox_mapping_back:99, bbox2roi:106, bbox2result:138, distance2bbox:159).
All functions are fixed-shape jnp programs (batched, jit-safe).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bbox2delta(proposals, gt, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.)):
    """Encode gt boxes as (dx, dy, dw, dh) deltas wrt proposals (xyxy)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0
    deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                        jnp.log(gw / pw), jnp.log(gh / ph)], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois, deltas, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
               max_shape=None, wh_ratio_clip=16 / 1000):
    """Decode (dx, dy, dw, dh) deltas into xyxy boxes (legacy +1 widths)."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = float(np.abs(np.log(wh_ratio_clip)))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0] + 1.0
    ph = rois[..., 3] - rois[..., 1] + 1.0
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5 + 0.5
    y1 = gy - gh * 0.5 + 0.5
    x2 = gx + gw * 0.5 - 0.5
    y2 = gy + gh * 0.5 - 0.5
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2bbox(points, distance, max_shape=None):
    """(left, top, right, bottom) distances from points -> xyxy boxes."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2roi(bbox_list):
    """Per-image box arrays -> packed (R, 5) rois with batch indices."""
    rois = []
    for img_id, bboxes in enumerate(bbox_list):
        idx = jnp.full((bboxes.shape[0], 1), float(img_id),
                       dtype=bboxes.dtype)
        rois.append(jnp.concatenate([idx, bboxes[:, :4]], axis=-1))
    return jnp.concatenate(rois, axis=0)


def bbox_mapping(bboxes, img_shape, scale_factor, flip):
    """Original-image boxes -> augmented-image coordinates."""
    from kgdet_tpu.data.transforms import flip_bboxes
    out = np.asarray(bboxes) * scale_factor
    if flip:
        out = flip_bboxes(out, img_shape[1])
    return out


def bbox_mapping_back(bboxes, img_shape, scale_factor, flip):
    """Augmented-image boxes -> original-image coordinates."""
    from kgdet_tpu.data.transforms import flip_bboxes
    out = np.asarray(bboxes)
    if flip:
        out = flip_bboxes(out, img_shape[1])
    return out / scale_factor


def bbox2result(bboxes, labels, num_classes):
    """(N, 5) dets + (N,) 0-based labels -> per-class numpy list."""
    bboxes = np.asarray(bboxes)
    labels = np.asarray(labels)
    return [bboxes[labels == c] for c in range(num_classes)]
