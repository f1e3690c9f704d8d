"""Remaining native-op equivalents: masked conv, deformable RoI pooling.

- masked_conv2d: the reference's CUDA kernel (mmdet/ops/masked_conv) gathers
  only masked positions into an im2col buffer as a *speed* optimization for
  guided anchoring; the mathematical result equals conv(x) * mask. On TPU a
  dense conv is MXU-optimal, so this is the faithful (and faster) program.
- deform_roi_pooling: deformable RoI pooling v2
  (mmdet/ops/dcn/deform_pool.py): RoIAlign bins shifted by learned offsets
  (optionally gamma-scaled by the roi size) with a modulation mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from kgdet_tpu.ops.deform import bilinear_gather


def masked_conv2d(x, mask, weight, bias=None, stride=1):
    """Conv evaluated only where mask > 0 (zeros elsewhere).

    x: (B, H, W, C); mask: (B, H', W') for the output grid;
    weight: (kh, kw, C, Cout).
    """
    y = lax.conv_general_dilated(
        x, weight, (stride, stride), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if bias is not None:
        y = y + bias
    return y * (mask[..., None] > 0).astype(y.dtype)


def deform_roi_pooling(feat, rois, offsets, out_size=7, spatial_scale=1.0,
                       sample_num=2, gamma=0.1, modulation=None):
    """Deformable RoI pooling: bin centers shifted by per-bin offsets.

    feat: (B, H, W, C); rois: (R, 5) (batch_idx, x1, y1, x2, y2);
    offsets: (R, out, out, 2) normalized (dy, dx) per bin, scaled by
    gamma * roi size; modulation: optional (R, out, out) gates.
    """
    B, H, W, C = feat.shape
    R = rois.shape[0]
    s = sample_num
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size

    grid = (jnp.arange(out_size)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s)          # (out, s)
    ys = y1[:, None, None] + bin_h[:, None, None] * grid[None]
    xs = x1[:, None, None] + bin_w[:, None, None] * grid[None]
    n = out_size * s
    yy = jnp.broadcast_to(ys.reshape(R, n)[:, :, None], (R, n, n))
    xx = jnp.broadcast_to(xs.reshape(R, n)[:, None, :], (R, n, n))

    # per-bin offsets, replicated to the s x s samples of each bin
    dy = jnp.repeat(jnp.repeat(offsets[..., 0], s, 1), s, 2) \
        * gamma * roi_h[:, None, None]
    dx = jnp.repeat(jnp.repeat(offsets[..., 1], s, 1), s, 2) \
        * gamma * roi_w[:, None, None]
    pos = jnp.stack([yy + dy, xx + dx], axis=-1).reshape(R, n * n, 1, 2)

    samples = bilinear_gather(feat[batch_idx], pos).reshape(R, n, n, C)
    out = samples.reshape(R, out_size, s, out_size, s, C).mean(axis=(2, 4))
    if modulation is not None:
        out = out * modulation[..., None]
    return out
