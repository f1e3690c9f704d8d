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


def cross_entropy_loss(logits, labels, weights=None, avg_factor=None):
    """Softmax CE over (N, C+1) logits with 0-based integer labels
    (parity: mmdet/models/losses/cross_entropy_loss.py)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if weights is not None:
        loss = loss * weights
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


def balanced_l1_loss(pred, target, weights=None, beta=1.0, alpha=0.5,
                     gamma=1.5, avg_factor=None):
    """Balanced L1 (Libra R-CNN; parity: mmdet balanced_l1_loss.py)."""
    diff = jnp.abs(pred - target)
    b = jnp.e ** (gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log1p(b * diff / beta)
        - alpha * diff,
        gamma * diff + gamma / b - alpha * beta)
    if weights is not None:
        loss = loss * weights
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


def iou_loss(pred, target, weights=None, eps=1e-6, avg_factor=None):
    """-log(IoU) between xyxy boxes (parity: mmdet iou_loss.py)."""
    tl = jnp.maximum(pred[..., :2], target[..., :2])
    br = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.clip(pred[..., 2] - pred[..., 0], 0, None) * \
        jnp.clip(pred[..., 3] - pred[..., 1], 0, None)
    area_t = jnp.clip(target[..., 2] - target[..., 0], 0, None) * \
        jnp.clip(target[..., 3] - target[..., 1], 0, None)
    union = area_p + area_t - inter
    iou = inter / jnp.maximum(union, eps)
    loss = -jnp.log(jnp.maximum(iou, eps))
    if weights is not None:
        loss = loss * weights
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


def giou_loss(pred, target, weights=None, eps=1e-6, avg_factor=None):
    """1 - GIoU between xyxy boxes."""
    tl = jnp.maximum(pred[..., :2], target[..., :2])
    br = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.clip(pred[..., 2] - pred[..., 0], 0, None) * \
        jnp.clip(pred[..., 3] - pred[..., 1], 0, None)
    area_t = jnp.clip(target[..., 2] - target[..., 0], 0, None) * \
        jnp.clip(target[..., 3] - target[..., 1], 0, None)
    union = jnp.maximum(area_p + area_t - inter, eps)
    iou = inter / union
    etl = jnp.minimum(pred[..., :2], target[..., :2])
    ebr = jnp.maximum(pred[..., 2:], target[..., 2:])
    ewh = jnp.clip(ebr - etl, 0, None)
    enclose = jnp.maximum(ewh[..., 0] * ewh[..., 1], eps)
    giou = iou - (enclose - union) / enclose
    loss = 1 - giou
    if weights is not None:
        loss = loss * weights
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


def ghm_c_loss(logits, labels, weights=None, bins=10, momentum=0.0,
               avg_factor=None):
    """Gradient-harmonized classification loss (static single-pass variant;
    parity: mmdet/models/losses/ghm_loss.py without the EMA state)."""
    num_classes = logits.shape[-1]
    target = jax.nn.one_hot(labels - 1, num_classes, dtype=logits.dtype)
    target = target * (labels > 0)[..., None].astype(logits.dtype)
    valid = (weights[..., None] > 0 if weights is not None
             else jnp.ones_like(target, bool))
    g = jnp.abs(jax.nn.sigmoid(logits) - target)
    total = jnp.maximum(valid.sum(), 1.0)
    edges = jnp.linspace(0, 1, bins + 1).at[-1].add(1e-6)
    w = jnp.zeros_like(g)
    for i in range(bins):
        in_bin = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = in_bin.sum()
        w = jnp.where(in_bin & (num_in_bin > 0),
                      total / jnp.maximum(num_in_bin, 1.0), w)
    w = w / bins
    bce = jnp.clip(logits, 0, None) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    loss = bce * w
    if avg_factor is None:
        avg_factor = total
    return loss.sum() / avg_factor


def mse_loss(pred, target, weights=None, avg_factor=None):
    """Mean-squared error (parity: mmdet mse_loss.py)."""
    loss = (pred - target) ** 2
    if weights is not None:
        loss = loss * weights
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / avg_factor


def bounded_iou_loss(pred, target, weights=None, beta=0.2, eps=1e-3,
                     avg_factor=None):
    """Bounded IoU loss on xyxy boxes (reference mmdet losses/iou_loss.py
    bounded_iou_loss): per-coordinate bounded terms for center offset and
    size ratio, smooth-L1-composed with threshold beta.
    """
    pred_ctrx = (pred[..., 0] + pred[..., 2]) * 0.5
    pred_ctry = (pred[..., 1] + pred[..., 3]) * 0.5
    pred_w = pred[..., 2] - pred[..., 0] + 1
    pred_h = pred[..., 3] - pred[..., 1] + 1
    t_ctrx = (target[..., 0] + target[..., 2]) * 0.5
    t_ctry = (target[..., 1] + target[..., 3]) * 0.5
    t_w = target[..., 2] - target[..., 0] + 1
    t_h = target[..., 3] - target[..., 1] + 1

    dx = t_ctrx - pred_ctrx
    dy = t_ctry - pred_ctry
    loss_dx = 1 - jnp.maximum(
        (t_w - 2 * jnp.abs(dx)) / (t_w + 2 * jnp.abs(dx) + eps), 0)
    loss_dy = 1 - jnp.maximum(
        (t_h - 2 * jnp.abs(dy)) / (t_h + 2 * jnp.abs(dy) + eps), 0)
    loss_dw = 1 - jnp.minimum(t_w / (pred_w + eps), pred_w / (t_w + eps))
    loss_dh = 1 - jnp.minimum(t_h / (pred_h + eps), pred_h / (t_h + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    loss = jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta)
    if weights is not None:
        loss = loss * weights
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / jnp.maximum(avg_factor, 1.0)
    return loss
