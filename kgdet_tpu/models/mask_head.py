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
