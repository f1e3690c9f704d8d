"""Anchor generation (base anchors, grid anchors, valid flags).

Parity reference: /root/reference/mmdetection/mmdet/core/anchor/
anchor_generator.py (ctr offsets, scales x ratios enumeration with
scale-major ordering when scale_major=True) — expressed as fixed-shape
numpy/jnp arrays instead of per-image python loops.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def base_anchors(base_size: float, scales: Sequence[float],
                 ratios: Sequence[float], ctr=None) -> np.ndarray:
    """(A, 4) base anchors around (0, 0) (or ctr), xyxy legacy (+1) style."""
    w = h = base_size
    if ctr is None:
        x_ctr, y_ctr = 0.5 * (w - 1), 0.5 * (h - 1)
    else:
        x_ctr, y_ctr = ctr
    ratios = np.asarray(ratios, np.float64)
    scales = np.asarray(scales, np.float64)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    # scale-major: anchors grouped by ratio, scales vary fastest
    ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
    return np.stack([
        x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
        x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)], axis=-1)


def grid_anchors(base: np.ndarray, feat_h: int, feat_w: int,
                 stride: int) -> jnp.ndarray:
    """(feat_h * feat_w * A, 4) anchors tiled over the feature grid."""
    shift_x = jnp.arange(feat_w, dtype=jnp.float32) * stride
    shift_y = jnp.arange(feat_h, dtype=jnp.float32) * stride
    sx = jnp.tile(shift_x, feat_h)
    sy = jnp.repeat(shift_y, feat_w)
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)        # (P, 4)
    out = jnp.asarray(base, jnp.float32)[None] + shifts[:, None]
    return out.reshape(-1, 4)


def anchor_valid_flags(feat_h: int, feat_w: int, num_anchors: int,
                       valid_h, valid_w) -> jnp.ndarray:
    """(feat_h * feat_w * A,) validity from per-image padded extents."""
    row = jnp.arange(feat_h)[:, None] < valid_h
    col = jnp.arange(feat_w)[None, :] < valid_w
    flags = (row & col).reshape(-1)
    return jnp.repeat(flags, num_anchors)
