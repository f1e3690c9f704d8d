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
    PK = P * K

    # position math in >= f32: under bf16 compute, coordinate values (tens
    # of pixels) would lose sub-pixel precision before the floor/frac split
    pos_dtype = jnp.promote_types(pos_yx.dtype, jnp.float32)
    y = pos_yx[..., 0].astype(pos_dtype).reshape(B, PK)
    x = pos_yx[..., 1].astype(pos_dtype).reshape(B, PK)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    dy = y - y0
    dx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # One gather of the whole 2x2xC bilinear footprint per tap (a contiguous
    # HBM patch): 4x fewer gather descriptors than per-corner row gathers —
    # the dominant cost of the op on TPU. Starts are clamped so the patch is
    # in-bounds; weights are then assigned by matching each *loaded*
    # coordinate against the tap's true corner coordinates, which also
    # zeroes out-of-bounds corners (CUDA boundary semantics).
    y0c = jnp.clip(y0i, 0, max(H - 2, 0))
    x0c = jnp.clip(x0i, 0, max(W - 2, 0))
    starts = jnp.stack([y0c, x0c], axis=-1)            # (B, PK, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    gather_one = lambda f, s: jax.lax.gather(
        f, s, dnums, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP)
    patches = jax.vmap(gather_one)(feat, starts)       # (B, PK, 2, 2, C)

    def axis_weights(c0c, c0i, frac):
        # weight of loaded coords c0c + {0, 1} wrt true corners c0i/c0i+1
        w = []
        for slot in (0, 1):
            cc = c0c + slot
            w.append(jnp.where(cc == c0i, 1.0 - frac,
                               jnp.where(cc == c0i + 1, frac, 0.0)))
        return w

    wy = axis_weights(y0c, y0i, dy)
    wx = axis_weights(x0c, x0i, dx)
    w4 = jnp.stack([jnp.stack([wy[0] * wx[0], wy[0] * wx[1]], axis=-1),
                    jnp.stack([wy[1] * wx[0], wy[1] * wx[1]], axis=-1)],
                   axis=-2).astype(feat.dtype)         # (B, PK, 2, 2)
    out = jnp.einsum(
        'bpijc,bpij->bpc', patches, w4,
        preferred_element_type=jnp.promote_types(feat.dtype, jnp.float32))
    return out.astype(feat.dtype).reshape(B, P, K, C)


def absolute_positions(rel_offsets_yx, H, W):
    """(B, H, W, K, 2) center-relative offsets -> (B, H*W, K, 2) absolute."""
    B = rel_offsets_yx.shape[0]
    K = rel_offsets_yx.shape[3]
    pos_dtype = jnp.promote_types(rel_offsets_yx.dtype, jnp.float32)
    cy = jnp.arange(H, dtype=pos_dtype)
    cx = jnp.arange(W, dtype=pos_dtype)
    centers = jnp.stack(
        [jnp.repeat(cy, W), jnp.tile(cx, H)], axis=-1)  # (H*W, 2)
    return rel_offsets_yx.astype(pos_dtype).reshape(B, H * W, K, 2) \
        + centers[None, :, None, :]


def use_pallas_sampling(shape, itemsize, platform=None, allow_tiling=True):
    """Pallas path gate: TPU backend, lane-aligned channels, map slabs fit
    the kernel VMEM budgets.

    With allow_tiling (the deform_sample path), large maps are accepted as
    long as one (HW, 128)-lane slice fits — the kernel channel-tiles them.
    Without it (the untiled column-split kernel), the whole map must fit.
    """
    import os
    if os.environ.get('KGDET_DISABLE_PALLAS'):
        return False
    H, W, C = shape
    if C % 128 != 0:
        return False
    from kgdet_tpu.ops.pallas_deform import slice_tiles
    S = C // 128
    st = slice_tiles(H * W, S, itemsize)
    if st is None or (not allow_tiling and st != S):
        return False
    if platform is None:
        try:
            platform = jax.devices()[0].platform
        except Exception:
            return False
    return platform == 'tpu'


def _use_pallas(feat):
    """Pallas path: TPU backend, lane-aligned channels, map fits in VMEM."""
    return use_pallas_sampling(feat.shape[1:], feat.dtype.itemsize)


def deform_sample(feat, rel_offsets_yx, stride: int = 1):
    """Sample every output pixel's K taps at center + offset.

    Args:
      feat: (B, H, W, C).
      rel_offsets_yx: (B, Ho, Wo, K, 2) tap offsets (y, x) relative to each
        output pixel's input-space center (= stride * output index), in
        feature-grid units. Ho/Wo = ceil(H/stride), ceil(W/stride).
      stride: conv stride; >1 subsamples output pixel centers (the DCN
        conv2_stride case, reference resnet.py:150-182).

    Returns:
      (B, Ho*Wo, K, C) sampled columns (row-major over (Ho, Wo)).

    Dispatches to the Pallas TPU kernel (ops/pallas_deform.py) when the
    feature map fits in VMEM; XLA gather otherwise.
    """
    B, H, W, C = feat.shape
    _, Ho, Wo, K, _ = rel_offsets_yx.shape
    if H < 2 or W < 2:
        # the 2x2 bilinear footprint needs at least 2 rows/cols; zero-pad
        # (out-of-bounds corners sample exact zeros, preserving the CUDA
        # boundary semantics). Hit by coarse pyramid levels, e.g. a
        # stride-64 map of a 64px-tall canvas.
        feat = jnp.pad(feat, ((0, 0), (0, max(2 - H, 0)),
                              (0, max(2 - W, 0)), (0, 0)))
        B, H, W, C = feat.shape
    pos_dtype = jnp.promote_types(rel_offsets_yx.dtype, jnp.float32)
    cy = jnp.arange(Ho, dtype=pos_dtype) * stride
    cx = jnp.arange(Wo, dtype=pos_dtype) * stride
    centers = jnp.stack(
        [jnp.repeat(cy, Wo), jnp.tile(cx, Ho)], axis=-1)  # (Ho*Wo, 2)
    pos = rel_offsets_yx.astype(pos_dtype).reshape(B, Ho * Wo, K, 2) \
        + centers[None, :, None, :]
    if _use_pallas(feat):
        from kgdet_tpu.ops.pallas_deform import deform_sample_hybrid
        return deform_sample_hybrid(feat, pos)
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


def deform_conv(feat, rel_offsets_yx, weight, bias=None, modulation=None,
                stride: int = 1):
    """Full deformable conv: sample + contract. Returns (B, Ho, Wo, Cout).

    modulation: optional (B, Ho, Wo, K) per-tap scalar gates — the v2
    ("modulated") DCN extension (parity: deform_conv_cuda.cpp:467-866,
    modulated_deform_conv_cuda_forward). None = v1 behavior.
    """
    B, Ho, Wo, K, _ = rel_offsets_yx.shape
    cols = deform_sample(feat, rel_offsets_yx, stride=stride)
    if modulation is not None:
        cols = cols * modulation.reshape(B, Ho * Wo, K, 1).astype(cols.dtype)
    out = deform_conv_from_samples(cols, weight, bias)
    return out.reshape(B, Ho, Wo, weight.shape[-1])


def grad_multiply(x, mul):
    """Scale only the gradient of x by ``mul`` (RepPoints gradient_mul trick).

    Parity: reppoints_head_kp3rep_cas_1_assign_once.py:135-143.
    """
    return mul * x + (1 - mul) * jax.lax.stop_gradient(x)
