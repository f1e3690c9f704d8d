"""RoI feature extraction ops (RoIAlign / RoIPool) as XLA gather programs.

The reference backs these with CUDA kernels
(/root/reference/mmdetection/mmdet/ops/roi_align/src/roi_align_kernel.cu,
roi_pool/src/roi_pool_kernel.cu) for its two-stage zoo. On TPU the bilinear
sampling reuses the deformable-sampling machinery (ops/deform.bilinear_gather)
and autodiff falls out of XLA — no custom kernel needed at two-stage-head
scale (RoIs x 7x7 taps is tiny next to the backbone).

Conventions match the CUDA kernels: RoIs are (batch_idx, x1, y1, x2, y2) in
image coordinates, scaled by spatial_scale; RoIAlign averages sample_num^2
(or adaptive ceil) bilinear taps per bin; RoIPool takes the max over the
bin's integer cells.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from kgdet_tpu.ops.deform import bilinear_gather


def roi_align(feat, rois, out_size=7, spatial_scale=1.0, sample_num=2):
    """RoIAlign over a (B, H, W, C) feature map.

    rois: (R, 5) of (batch_idx, x1, y1, x2, y2). Returns (R, out, out, C).
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

    # sample grid: per bin, s x s points at (i + (j + .5)/s) * bin
    grid = (jnp.arange(out_size)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s)  # (out, s)
    ys = y1[:, None, None] + bin_h[:, None, None] * grid[None]  # (R, out, s)
    xs = x1[:, None, None] + bin_w[:, None, None] * grid[None]
    # positions (R, out*s * out*s, 2) -> use bilinear_gather per batch elem
    yy = ys.reshape(R, -1)[:, :, None]          # (R, out*s, 1)
    xx = xs.reshape(R, -1)[:, None, :]          # (R, 1, out*s)
    n = out_size * s
    pos = jnp.stack([jnp.broadcast_to(yy, (R, n, n)),
                     jnp.broadcast_to(xx, (R, n, n))], axis=-1)
    pos = pos.reshape(R, n * n, 1, 2)

    # gather per roi from its batch element
    feat_rois = feat[batch_idx]                  # (R, H, W, C)
    samples = bilinear_gather(
        feat_rois, pos).reshape(R, n, n, C)      # (R, n, n, C)
    samples = samples.reshape(R, out_size, s, out_size, s, C)
    return samples.mean(axis=(2, 4))


def roi_pool(feat, rois, out_size=7, spatial_scale=1.0):
    """Max RoI pooling (quantized bins, parity: roi_pool_kernel.cu)."""
    B, H, W, C = feat.shape
    R = rois.shape[0]
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 4] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    feat_rois = feat[batch_idx]                  # (R, H, W, C)

    hh = jnp.arange(H)
    ww = jnp.arange(W)

    def one_bin(ph, pw):
        hstart = y1 + (roi_h * ph) // out_size
        hend = y1 + -(-(roi_h * (ph + 1)) // out_size)
        wstart = x1 + (roi_w * pw) // out_size
        wend = x1 + -(-(roi_w * (pw + 1)) // out_size)
        hmask = (hh[None] >= jnp.clip(hstart, 0, H)[:, None]) & \
                (hh[None] < jnp.clip(hend, 0, H)[:, None])   # (R, H)
        wmask = (ww[None] >= jnp.clip(wstart, 0, W)[:, None]) & \
                (ww[None] < jnp.clip(wend, 0, W)[:, None])   # (R, W)
        mask = (hmask[:, :, None] & wmask[:, None, :])[..., None]
        masked = jnp.where(mask, feat_rois, -jnp.inf)
        out = masked.max(axis=(1, 2))
        return jnp.where(jnp.isfinite(out), out, 0.0)

    rows = [jnp.stack([one_bin(ph, pw) for pw in range(out_size)], axis=1)
            for ph in range(out_size)]
    return jnp.stack(rows, axis=1)               # (R, out, out, C)
