"""Point-set primitives: grid generation, RepPoints->bbox transforms.

TPU-first: everything is expressed as fixed-shape batched jnp ops (no per-GT
python loops); the (H*W) grid is flattened once and reused across head stages.

Parity references:
- grid/valid flags: /root/reference/mmdetection/mmdet/core/anchor/
  point_generator.py:14-34
- points2bbox (minmax / partial_minmax / moment with learnable transfer):
  /root/reference/mmdetection/mmdet/models/anchor_heads/
  reppoints_head_kp3rep_cas_1_assign_once.py:342-391
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_points(feat_h: int, feat_w: int, stride: int, dtype=jnp.float32):
    """(H*W, 3) array of (x, y, stride) grid-point coordinates (row-major)."""
    xs = jnp.arange(feat_w, dtype=dtype) * stride
    ys = jnp.arange(feat_h, dtype=dtype) * stride
    xx = jnp.tile(xs, feat_h)
    yy = jnp.repeat(ys, feat_w)
    ss = jnp.full((feat_h * feat_w,), stride, dtype=dtype)
    return jnp.stack([xx, yy, ss], axis=-1)


def valid_flags(feat_h: int, feat_w: int, valid_h, valid_w):
    """(H*W,) bool mask of grid points within the per-image valid region.

    ``valid_h/valid_w`` may be traced scalars (per-image padded extents).
    """
    row = jnp.arange(feat_h)[:, None] < valid_h
    col = jnp.arange(feat_w)[None, :] < valid_w
    return (row & col).reshape(-1)


def points2bbox(pts, method='moment', moment_transfer=None, moment_mul=0.01,
                y_first=True):
    """Convert point sets (..., 2N) -> boxes (..., 4) [x1, y1, x2, y2].

    ``moment``: box centered at the point mean with half-extent
    std * exp(learned transfer); the transfer parameter receives only
    ``moment_mul`` of its gradient (EMA-style gate). std uses the unbiased
    (n-1) estimator to match the reference's torch.std.
    """
    shape = pts.shape
    n = shape[-1] // 2
    pts = pts.reshape(*shape[:-1], n, 2)
    if y_first:
        pts_y, pts_x = pts[..., 0], pts[..., 1]
    else:
        pts_x, pts_y = pts[..., 0], pts[..., 1]
    if method == 'minmax':
        return jnp.stack([pts_x.min(-1), pts_y.min(-1),
                          pts_x.max(-1), pts_y.max(-1)], axis=-1)
    if method == 'partial_minmax':
        px, py = pts_x[..., :4], pts_y[..., :4]
        return jnp.stack([px.min(-1), py.min(-1),
                          px.max(-1), py.max(-1)], axis=-1)
    if method == 'moment':
        mean_x = pts_x.mean(-1)
        mean_y = pts_y.mean(-1)
        # eps inside the sqrt: d(std)/d(pts) = (pts - mean)/((n-1) std)
        # blows up when a point set collapses (std -> 0), which a
        # from-scratch run can hit — observed as loss NaN at epoch 40 of
        # the demo overfit. 1e-6 bounds the gradient at ~5e2 while
        # perturbing real stds (~1) by < 1e-6.
        nb = pts_x.shape[-1] - 1
        var_x = jnp.sum((pts_x - mean_x[..., None]) ** 2, -1) / nb
        var_y = jnp.sum((pts_y - mean_y[..., None]) ** 2, -1) / nb
        std_x = jnp.sqrt(var_x + 1e-6)
        std_y = jnp.sqrt(var_y + 1e-6)
        mt = (moment_transfer * moment_mul
              + jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul))
        half_w = std_x * jnp.exp(mt[0])
        half_h = std_y * jnp.exp(mt[1])
        return jnp.stack([mean_x - half_w, mean_y - half_h,
                          mean_x + half_w, mean_y + half_h], axis=-1)
    raise ValueError(f'unknown transform method: {method}')


def yx_to_xy(pts):
    """Swap interleaved (y, x) pairs to (x, y) pairs along the last axis."""
    shape = pts.shape
    p = pts.reshape(*shape[:-1], shape[-1] // 2, 2)
    return p[..., ::-1].reshape(shape)


def offsets_to_coords(offsets, centers_xy, stride, y_first=True):
    """Decode per-point offsets to absolute image coordinates.

    offsets: (..., P, 2N) per-grid-point offset fields in stride units;
    centers_xy: (P, 2) grid-point centers. Returns (..., P, 2N) as
    interleaved (x, y) absolute coordinates.
    """
    if y_first:
        offsets = yx_to_xy(offsets)
    n = offsets.shape[-1] // 2
    centers = jnp.tile(centers_xy, (1, n))
    return offsets * stride + centers
