"""Deformable sampling / deformable convolution, TPU-native formulation.

The reference implements DeformConv as a CUDA im2col-bilinear gather followed
by a GEMM (/root/reference/mmdetection/mmdet/ops/dcn/src/
deform_conv_cuda_kernel.cu:84-245). On TPU we express the same computation as
a batched row-gather + lerp (VPU) feeding one large contraction (MXU):

    columns[b, p, k, c] = bilinear(feat[b], center_p + offset[b, p, k])
    out[b, p, co]       = sum_{k, c} columns[b, p, k, c] * w[k, c, co] + bias

Key design departures from the CUDA version:
- tap positions are passed as offsets *relative to the output pixel center*
  (i.e. the RepPoints field directly) instead of `reppoints - base_grid`
  threaded through a kernel that re-adds the base grid; the two formulations
  are identical because DCN samples at `p0 + base_k + offset_k`.
- the cls/reg branches of a KGDet cascade block share tap positions, so the
  caller can concatenate both feature maps channel-wise and gather once.

Out-of-bounds semantics match the CUDA kernel: each of the 4 bilinear corners
contributes only when it lies inside the feature map.

Autodiff falls out of XLA (gather -> scatter-add transpose; the bilinear
weights are linear in the offsets wherever floor() is locally constant),
matching the CUDA backward's coordinate-weight formula
(deform_conv_cuda_kernel.cu:145-188).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_gather(feat, pos_yx):
    """Bilinear-sample a feature map at arbitrary positions.

    Args:
      feat: (B, H, W, C) feature map.
      pos_yx: (B, P, K, 2) absolute sampling positions in feature-grid
        coordinates, last axis = (y, x).

    Returns:
      (B, P, K, C) samples; positions fully outside the map yield 0, and each
      out-of-bounds bilinear corner contributes 0.
    """
    B, H, W, C = feat.shape
    _, P, K, _ = pos_yx.shape
    feat_flat = feat.reshape(B, H * W, C)

    y = pos_yx[..., 0]
    x = pos_yx[..., 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    dy = (y - y0).astype(feat.dtype)
    dx = (x - x0).astype(feat.dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    out = jnp.zeros((B, P, K, C), dtype=feat.dtype)
    for cy, cx, wgt in (
        (y0i, x0i, (1 - dy) * (1 - dx)),
        (y0i, x0i + 1, (1 - dy) * dx),
        (y0i + 1, x0i, dy * (1 - dx)),
        (y0i + 1, x0i + 1, dy * dx),
    ):
        valid = (cy >= 0) & (cy < H) & (cx >= 0) & (cx < W)
        idx = jnp.clip(cy, 0, H - 1) * W + jnp.clip(cx, 0, W - 1)
        rows = jnp.take_along_axis(
            feat_flat, idx.reshape(B, P * K, 1), axis=1).reshape(B, P, K, C)
        w = jnp.where(valid, wgt, 0).astype(feat.dtype)
        out = out + rows * w[..., None]
    return out


def deform_sample(feat, rel_offsets_yx):
    """Sample every output pixel's K taps at center + offset.

    Args:
      feat: (B, H, W, C).
      rel_offsets_yx: (B, H, W, K, 2) tap offsets (y, x) relative to each
        pixel center, in feature-grid units.

    Returns:
      (B, H*W, K, C) sampled columns (row-major over (H, W)).
    """
    B, H, W, C = feat.shape
    K = rel_offsets_yx.shape[3]
    cy = jnp.arange(H, dtype=rel_offsets_yx.dtype)
    cx = jnp.arange(W, dtype=rel_offsets_yx.dtype)
    centers = jnp.stack(
        [jnp.repeat(cy, W), jnp.tile(cx, H)], axis=-1)  # (H*W, 2)
    pos = rel_offsets_yx.reshape(B, H * W, K, 2) + centers[None, :, None, :]
    return bilinear_gather(feat, pos)


def deform_conv_from_samples(samples, weight, bias=None):
    """Contract gathered columns with a DCN weight on the MXU.

    samples: (B, P, K, C); weight: (K, C, Cout); bias: (Cout,) or None.
    Returns (B, P, Cout).
    """
    out = jnp.einsum('bpkc,kco->bpo', samples, weight,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(samples.dtype)


def deform_conv(feat, rel_offsets_yx, weight, bias=None):
    """Full deformable conv: sample + contract. Returns (B, H, W, Cout)."""
    B, H, W, _ = feat.shape
    cols = deform_sample(feat, rel_offsets_yx)
    out = deform_conv_from_samples(cols, weight, bias)
    return out.reshape(B, H, W, weight.shape[-1])


def grad_multiply(x, mul):
    """Scale only the gradient of x by ``mul`` (RepPoints gradient_mul trick).

    Parity: reppoints_head_kp3rep_cas_1_assign_once.py:135-143.
    """
    return mul * x + (1 - mul) * jax.lax.stop_gradient(x)
