"""Detection losses as fused XLA expressions (no custom kernels needed).

The reference backs focal loss with a CUDA kernel
(/root/reference/mmdetection/mmdet/ops/sigmoid_focal_loss/) purely to fuse the
elementwise math; on TPU the jnp expression below compiles to the same fused
VPU loop, so no Pallas kernel is warranted.

Parity references: focal math mirrors mmdet/models/losses/focal_loss.py:10-25,
smooth-L1 mirrors mmdet/models/losses/smooth_l1_loss.py:8-16, weighting /
avg_factor semantics mirror mmdet/models/losses/utils.py:26-52.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, labels, weights=None, gamma=2.0, alpha=0.25,
                       avg_factor=None):
    """Sigmoid focal loss over (N, C) logits with integer labels.

    labels: (N,) int, 0 = background, 1..C = positive class (1-based).
    weights: (N,) per-sample weight (broadcast over classes).
    Returns sum(loss * weight) / avg_factor (or plain mean if no avg_factor).
    """
    num_classes = logits.shape[-1]
    target = jax.nn.one_hot(labels - 1, num_classes, dtype=logits.dtype)
    target = target * (labels > 0)[..., None].astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * target + p * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt ** gamma
    # numerically-stable BCE with logits
    bce = jnp.clip(logits, 0, None) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce * focal_weight
    if weights is not None:
        loss = loss * weights[..., None]
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


def smooth_l1_loss(pred, target, weights=None, beta=1.0, avg_factor=None):
    """Elementwise smooth-L1 with optional per-element weights and avg_factor."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if weights is not None:
        loss = loss * weights
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor
