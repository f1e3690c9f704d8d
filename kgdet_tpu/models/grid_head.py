"""Grid R-CNN Plus grid head: point-wise heatmaps replace box regression.

Parity surface: reference mmdet/models/mask_heads/grid_head.py — 8-conv
trunk (stride 2 on the first), first/second-order feature fusion over the
grid-point neighbor graph (5x5 depthwise + 1x1 transitions), grouped
deconvs to a half-sized (28x28) heatmap per grid point, sub-region
targets, and boundary voting at decode
(detectors/grid_rcnn.py integrates it after the box head).

TPU-first notes: grouped (ConvTranspose) layers are expressed as per-point
slices (9 x 64ch) since flax's ConvTranspose has no group support; all
target/decode math is vectorized over padded RoI sets with masks.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def grid_sub_regions(grid_points: int = 9, whole_map: int = 56):
    """Per-point (x1, y1) sub-region origins (grid_head.py calc_sub_regions,
    half-size windows of the whole map)."""
    gs = int(np.sqrt(grid_points))
    half = whole_map // 4 * 2
    out = []
    for i in range(grid_points):
        x_idx, y_idx = i // gs, i % gs
        def origin(idx):
            if idx == 0:
                return 0
            if idx == gs - 1:
                return half
            return max(int((idx / (gs - 1) - 0.25) * whole_map), 0)
        out.append((origin(x_idx), origin(y_idx)))
    return np.asarray(out, np.int32)          # (P, 2) = (x1, y1)


def grid_neighbors(grid_points: int = 9):
    gs = int(np.sqrt(grid_points))
    out = []
    for i in range(gs):
        for j in range(gs):
            n = []
            if i > 0:
                n.append((i - 1) * gs + j)
            if j > 0:
                n.append(i * gs + j - 1)
            if j < gs - 1:
                n.append(i * gs + j + 1)
            if i < gs - 1:
                n.append((i + 1) * gs + j)
            out.append(tuple(n))
    return out


class _Transition(nn.Module):
    """5x5 depthwise + 1x1 pointwise transition (grid_head.py:115-135)."""
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (5, 5), padding='SAME',
                    feature_group_count=self.channels, dtype=self.dtype,
                    name='dw')(x)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                       name='pw')(x)


class GridHead(nn.Module):
    grid_points: int = 9
    num_convs: int = 8
    point_feat_channels: int = 64
    roi_feat_size: int = 14
    gn_groups: int = 36
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (N, roi, roi, C). Returns (fused, unfused) heatmaps, each
        (N, half_map, half_map, grid_points); unfused == fused at test."""
        P = self.grid_points
        c = self.point_feat_channels
        C = P * c
        h = x
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            h = nn.Conv(C, (3, 3), strides=(stride, stride), padding='SAME',
                        dtype=self.dtype, name=f'convs_{i}')(h)
            h = nn.GroupNorm(num_groups=self.gn_groups, dtype=self.dtype,
                             name=f'convs_gn_{i}')(h)
            h = nn.relu(h)

        neighbors = grid_neighbors(P)
        slices = [h[..., i * c:(i + 1) * c] for i in range(P)]
        fo = []
        for i, nbrs in enumerate(neighbors):
            acc = slices[i]
            for j, p in enumerate(nbrs):
                acc = acc + _Transition(c, dtype=self.dtype,
                                        name=f'forder_{i}_{j}')(slices[p])
            fo.append(acc)
        so = []
        for i, nbrs in enumerate(neighbors):
            acc = slices[i]
            for j, p in enumerate(nbrs):
                acc = acc + _Transition(c, dtype=self.dtype,
                                        name=f'sorder_{i}_{j}')(fo[p])
            so.append(acc)

        # deconv stack is shared by the fused and unfused paths
        # (reference grid_head.py:175-188 applies the same deconv1/deconv2)
        deconv1s = [nn.ConvTranspose(c, (4, 4), strides=(2, 2),
                                     padding='SAME', dtype=self.dtype,
                                     name=f'deconv1_{i}') for i in range(P)]
        gn1 = nn.GroupNorm(num_groups=P, dtype=self.dtype,
                           name='deconv1_gn')
        deconv2s = [nn.ConvTranspose(
            1, (4, 4), strides=(2, 2), padding='SAME',
            bias_init=nn.initializers.constant(
                -float(np.log(0.99 / 0.01))),
            dtype=self.dtype, name=f'deconv2_{i}') for i in range(P)]

        def deconvs(t_slices):
            u = jnp.concatenate(
                [deconv1s[i](t) for i, t in enumerate(t_slices)], axis=-1)
            u = nn.relu(gn1(u))
            return jnp.concatenate(
                [deconv2s[i](u[..., i * c:(i + 1) * c]) for i in range(P)],
                axis=-1)

        fused = deconvs(so)
        unfused = deconvs(slices) if train else fused
        return fused, unfused


def grid_targets(pos_boxes, gt_boxes, grid_points: int = 9,
                 whole_map: int = 56, radius: int = 1):
    """(R, half, half, P) sub-region heatmap targets (grid_head.py
    get_target, vectorized: circle masks via broadcasted iota).

    pos_boxes: (R, 4) sampled proposals; gt_boxes: (R, 4) their assigned
    GTs. Also returns (R,) validity (boxes larger than the grid size).
    """
    gs = int(np.sqrt(grid_points))
    half = whole_map // 4 * 2
    sub = jnp.asarray(grid_sub_regions(grid_points, whole_map))

    w = pos_boxes[:, 2] - pos_boxes[:, 0]
    h = pos_boxes[:, 3] - pos_boxes[:, 1]
    x1 = pos_boxes[:, 0] - w / 2
    y1 = pos_boxes[:, 1] - h / 2
    # the reference validates against the 2x-expanded RoI (pos_bbox_ws =
    # 2*w), not the original box (grid_head.py get_target)
    valid = (2 * w > gs) & (2 * h > gs)

    factors = np.asarray(
        [(1 - (j // gs) / (gs - 1), 1 - (j % gs) / (gs - 1))
         for j in range(grid_points)], np.float32)           # (P, 2)
    fx = jnp.asarray(factors[:, 0])[None]
    fy = jnp.asarray(factors[:, 1])[None]
    gx = fx * gt_boxes[:, 0:1] + (1 - fx) * gt_boxes[:, 2:3]  # (R, P)
    gy = fy * gt_boxes[:, 1:2] + (1 - fy) * gt_boxes[:, 3:4]
    cx = jnp.floor((gx - x1[:, None]) / jnp.maximum(2 * w[:, None], 1e-6)
                   * whole_map).astype(jnp.int32)
    cy = jnp.floor((gy - y1[:, None]) / jnp.maximum(2 * h[:, None], 1e-6)
                   * whole_map).astype(jnp.int32)

    # sub-region pixel coordinates in whole-map space
    ix = jnp.arange(half)[None, None, None, :] + sub[None, :, 0, None, None]
    iy = jnp.arange(half)[None, None, :, None] + sub[None, :, 1, None, None]
    d2 = (ix - cx[:, :, None, None]) ** 2 + (iy - cy[:, :, None, None]) ** 2
    inside = ((cx >= 0) & (cx < whole_map)
              & (cy >= 0) & (cy < whole_map))[:, :, None, None]
    t = ((d2 <= radius * radius) & inside
         & valid[:, None, None, None]).astype(jnp.float32)
    return jnp.transpose(t, (0, 2, 3, 1)), valid              # NHWC


def grid_loss(fused, unfused, targets, pos_weights, loss_weight=15.0):
    """Sigmoid BCE on both heatmaps over the positive RoIs
    (grid_head.py loss; CrossEntropyLoss(use_sigmoid, weight 15))."""
    def bce(logits):
        logits = logits.astype(jnp.float32)
        per = jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))
        per = per * pos_weights[:, None, None, None]
        denom = jnp.maximum(pos_weights.sum(), 1.0) * np.prod(
            logits.shape[1:])
        return loss_weight * per.sum() / denom

    return bce(fused) + bce(unfused)


def grid_refine_boxes(heatmap, boxes, grid_points: int = 9,
                      whole_map: int = 56):
    """Decode heatmaps into refined boxes by boundary voting
    (grid_head.py get_bboxes, vectorized).

    heatmap: (R, half, half, P) logits; boxes: (R, 4).
    """
    gs = int(np.sqrt(grid_points))
    half = whole_map // 4 * 2
    sub = jnp.asarray(grid_sub_regions(grid_points, whole_map))
    R = boxes.shape[0]
    probs = jax.nn.sigmoid(heatmap.astype(jnp.float32))
    flat = jnp.transpose(probs, (0, 3, 1, 2)).reshape(R, grid_points, -1)
    scores = flat.max(axis=-1)                               # (R, P)
    pos = flat.argmax(axis=-1)
    xs = (pos % half) + sub[None, :, 0]
    ys = (pos // half) + sub[None, :, 1]

    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    x1 = boxes[:, 0][:, None] - w / 2
    y1 = boxes[:, 1][:, None] - h / 2
    abs_x = (xs + 0.5) / half * w + x1
    abs_y = (ys + 0.5) / half * h + y1

    x1_inds = np.arange(gs)
    y1_inds = np.arange(gs) * gs
    x2_inds = grid_points - gs + np.arange(gs)
    y2_inds = (np.arange(gs) + 1) * gs - 1

    def vote(vals, s, inds):
        return (vals[:, inds] * s[:, inds]).sum(-1) / jnp.maximum(
            s[:, inds].sum(-1), 1e-6)

    return jnp.stack([vote(abs_x, scores, x1_inds),
                      vote(abs_y, scores, y1_inds),
                      vote(abs_x, scores, x2_inds),
                      vote(abs_y, scores, y2_inds)], axis=-1)
