"""FCN mask head + mask target extraction (Mask R-CNN family).

Parity surface: reference mmdet/models/mask_heads/fcn_mask_head.py (4 convs,
2x deconv, per-class 1x1 logits at 28x28) and mmdet/core/mask/mask_target.py
(GT mask crops aligned to sampled proposals).

TPU-first: GT masks ride along as fixed-shape downsampled rasters
(B, max_gts, Hm, Wm); per-proposal 28x28 targets come from roi_align over
them (no host round-trip, differentiable-free crop).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from kgdet_tpu.models.layers import normal_init
from kgdet_tpu.ops.roi import roi_align


class FCNMaskHead(nn.Module):
    """FCN mask head; with_info_flow adds the HTC residual input (a 1x1
    transform of the previous stage's pre-deconv mask features —
    reference htc_mask_head.py conv_res)."""
    num_classes: int = 13
    in_channels: int = 256
    conv_channels: int = 256
    num_convs: int = 4
    with_info_flow: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats, res_feat=None, return_feat: bool = False):
        """roi_feats: (..., r, r, C) -> mask logits (..., 2r, 2r, classes);
        with return_feat also the (..., r, r, C) pre-deconv features."""
        x = roi_feats
        if self.with_info_flow and res_feat is not None:
            x = x + nn.Conv(x.shape[-1], (1, 1),
                            kernel_init=normal_init(0.01), dtype=self.dtype,
                            name='conv_res')(res_feat)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(
                self.conv_channels, (3, 3), padding='SAME',
                kernel_init=normal_init(0.01), dtype=self.dtype,
                name=f'conv_{i}')(x))
        feat = x
        x = nn.relu(nn.ConvTranspose(
            self.conv_channels, (2, 2), strides=(2, 2),
            kernel_init=normal_init(0.01), dtype=self.dtype,
            name='upsample')(x))
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=normal_init(0.01), dtype=self.dtype,
                         name='conv_logits')(x)
        return (logits, feat) if return_feat else logits


class MaskIoUHead(nn.Module):
    """Mask-IoU regressor (Mask Scoring R-CNN).

    Parity surface: reference mask_heads/maskiou_head.py:13-98 — input is
    the 14x14 mask RoI features concatenated with the predicted mask
    (sigmoid, 2x2-maxpooled from 28x28), 4 convs (last stride 2), 2 fcs,
    per-class IoU outputs. Fixed-shape adaptation (documented): the
    concatenated mask channel is the best-scoring class's mask for every
    RoI (the reference feeds the sampled positive's GT-class mask); the
    loss still supervises the assigned-label output channel.
    """
    num_classes: int = 13
    conv_channels: int = 256
    fc_channels: int = 1024
    num_convs: int = 4
    num_fcs: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask_feats, mask_pred):
        """mask_feats (..., 14, 14, C), mask_pred (..., 28, 28) logits of
        the selected class -> (..., num_classes) IoU predictions."""
        pooled = nn.max_pool(
            jax.nn.sigmoid(mask_pred.astype(self.dtype))[..., None],
            (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feats, pooled], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(
                self.conv_channels, (3, 3), strides=(stride, stride),
                padding=[(1, 1), (1, 1)], kernel_init=normal_init(0.01),
                dtype=self.dtype, name=f'conv_{i}')(x))
        x = x.reshape(x.shape[:-3] + (-1,))
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(
                self.fc_channels,
                kernel_init=nn.initializers.variance_scaling(
                    1.0 / 3, 'fan_in', 'uniform'),
                dtype=self.dtype, name=f'fc_{i}')(x))
        return nn.Dense(self.num_classes, kernel_init=normal_init(0.01),
                        dtype=self.dtype, name='fc_mask_iou')(x)


def maskiou_targets(mask_logits_cls, mask_t, thr=0.5):
    """IoU between the thresholded predicted mask and its GT mask crop.

    mask_logits_cls: (B, R, S, S) selected-class logits; mask_t: (B, R, S,
    S) targets in [0, 1]. The reference additionally rescales the GT area
    by the inside-box ratio (maskiou_head.py get_target) to approximate the
    full-instance IoU; with crop-aligned soft targets the in-box IoU is the
    fixed-shape analog.
    """
    pred = (jax.nn.sigmoid(mask_logits_cls.astype(jnp.float32)) > thr) \
        .astype(jnp.float32)
    tgt = (mask_t > thr).astype(jnp.float32)
    inter = (pred * tgt).sum(axis=(-1, -2))
    union = pred.sum(axis=(-1, -2)) + tgt.sum(axis=(-1, -2)) - inter
    return inter / jnp.maximum(union, 1e-7)


class FusedSemanticHead(nn.Module):
    """Multi-level fused semantic segmentation branch (HTC).

    Parity surface: reference mask_heads/fused_semantic_head.py:11-108 —
    per-level lateral 1x1 convs summed at the fusion level (bilinear
    resize), 4 3x3 convs, then a 1x1 stuff-logit head and a 1x1 embedding
    whose RoI pooling is added to the box/mask features.
    """
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    conv_channels: int = 256
    num_classes: int = 183
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == self.num_ins
        lat = [nn.Conv(self.conv_channels, (1, 1),
                       kernel_init=normal_init(0.01), dtype=self.dtype,
                       name=f'lateral_convs_{i}') for i in range(self.num_ins)]
        ref = feats[self.fusion_level]
        H, W = ref.shape[1:3]
        x = lat[self.fusion_level](ref)
        for i, f in enumerate(feats):
            if i == self.fusion_level:
                continue
            r = jax.image.resize(f, f.shape[:1] + (H, W) + f.shape[3:],
                                 method='bilinear')
            x = x + lat[i](r)
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(
                self.conv_channels, (3, 3), padding='SAME',
                kernel_init=normal_init(0.01), dtype=self.dtype,
                name=f'convs_{i}')(x))
        logits = nn.Conv(self.num_classes, (1, 1),
                         kernel_init=normal_init(0.01), dtype=self.dtype,
                         name='conv_logits')(x)
        embedding = nn.relu(nn.Conv(
            self.conv_channels, (1, 1), kernel_init=normal_init(0.01),
            dtype=self.dtype, name='conv_embedding')(x))
        return logits, embedding


def semantic_loss(logits, gt_seg, ignore_label=255, loss_weight=0.2):
    """Pixel CE on the stride-8 stuff map (fused_semantic_head.py loss)."""
    logits = logits.astype(jnp.float32)
    C = logits.shape[-1]
    valid = (gt_seg != ignore_label) & (gt_seg >= 0) & (gt_seg < C)
    labels = jnp.clip(gt_seg, 0, C - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return loss_weight * ce.sum() / jnp.maximum(valid.sum(), 1)


def mask_targets(gt_masks, assigned_gt, proposals, mask_stride,
                 out_size=28):
    """Crop each proposal's assigned GT mask to (out, out).

    gt_masks: (B, G, Hm, Wm) float in {0, 1} at 1/mask_stride resolution;
    assigned_gt: (B, R) int; proposals: (B, R, 4) image coords.
    Returns (B, R, out, out) soft targets in [0, 1].
    """
    B, G, Hm, Wm = gt_masks.shape
    R = proposals.shape[1]
    flat = gt_masks.reshape(B * G, Hm, Wm, 1)
    batch_idx = (jnp.arange(B)[:, None] * G + assigned_gt).reshape(-1)
    rois = jnp.concatenate(
        [batch_idx[:, None].astype(proposals.dtype),
         proposals.reshape(-1, 4)], axis=-1)
    crops = roi_align(flat, rois, out_size=out_size,
                      spatial_scale=1.0 / mask_stride, sample_num=2)
    return crops.reshape(B, R, out_size, out_size)


def mask_loss(mask_logits, targets, labels, pos_weights):
    """Per-pixel BCE on each positive proposal's own-class mask channel.

    mask_logits: (B, R, S, S, C); targets: (B, R, S, S) in [0, 1];
    labels: (B, R) 1-based class; pos_weights: (B, R) float.
    """
    C = mask_logits.shape[-1]
    cls_idx = jnp.clip(labels - 1, 0, C - 1)
    logits = jnp.take_along_axis(
        mask_logits.astype(jnp.float32),
        cls_idx[..., None, None, None], axis=-1)[..., 0]
    bce = jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    per_roi = bce.mean(axis=(-1, -2))
    avg = jnp.maximum(pos_weights.sum(), 1.0)
    return (per_roi * pos_weights).sum() / avg


def paste_masks(det_boxes, mask_probs, img_h, img_w, thr=0.5):
    """Host-side: paste (N, S, S) mask probabilities into binary image masks.

    det_boxes: (N, 4+) xyxy in image coords (numpy). Returns list of (h, w)
    uint8 masks (parity: fcn_mask_head.get_seg_masks).
    """
    import cv2
    import numpy as np

    out = []
    for box, prob in zip(np.asarray(det_boxes), np.asarray(mask_probs)):
        x1, y1, x2, y2 = box[:4]
        w = max(int(round(x2 - x1 + 1)), 1)
        h = max(int(round(y2 - y1 + 1)), 1)
        x1 = int(max(round(x1), 0))
        y1 = int(max(round(y1), 0))
        m = cv2.resize(prob.astype(np.float32), (w, h))
        full = np.zeros((img_h, img_w), np.uint8)
        ww = min(w, img_w - x1)
        hh = min(h, img_h - y1)
        if ww > 0 and hh > 0:
            full[y1:y1 + hh, x1:x1 + ww] = (m[:hh, :ww] >= thr)
        out.append(full)
    return out
