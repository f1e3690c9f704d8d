"""Fused frozen ResNet bottleneck block (Pallas, TPU).

Why: layer1 of the full-size backbone is HBM-bandwidth bound, not
compute bound. Its three stride-1 bottleneck blocks move ~4.7 GB of
inter-conv activations per batch-8 step (each 1x1/3x3 conv reads its
input from and writes its output to HBM; the residual add reads two
256-channel tensors) for only ~0.2 TFLOP of MXU work — measured 6.3 ms
device-busy against a ~1.1 ms compute roofline. XLA cannot fuse across
convolutions, so the fix is one Pallas kernel per block that keeps every
intermediate in VMEM: the only HBM traffic is the block input and output.

Kernel shape: grid (B, H // rows_per_step). Each step loads a row tile
plus one halo row above/below (three block specs on the same array with
clamped index maps; the out-of-image halo is zero-masked in-kernel since
the 3x3 conv zero-pads), computes

    a   = relu(x3 @ W1 + b1)              # 1x1, BN folded into W/b
    b_r = relu(patches(a) @ W2 + b2)      # 3x3 as per-row im2col dot
    c_r = b_r @ W3 + b3                   # 1x1
    out = relu(c_r + identity)            # identity optionally W_d @ x

with FrozenBatchNorm folded into each conv's weight/bias (stats are
frozen, so folding is exact up to float associativity). The im2col
patches are built in registers from an `a` scratch with zeroed width
borders — nothing but the input/output tile crosses HBM.

Used only for frozen stages (the kernel has no VJP; callers stop
gradients on all operands — identical semantics since a frozen stage's
params take no updates and its output is stop_gradient'ed anyway).

Parity reference: /root/reference/mmdetection/mmdet/models/backbones/
resnet.py:86-266 (Bottleneck, pytorch/caffe styles are identical at
stride 1; BN in eval mode per resnet.py:518-525).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# scoped-VMEM headroom check (bytes); leave slack for double buffering
VMEM_BUDGET = 13 * 2 ** 20


def fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold a FrozenBatchNorm that FOLLOWS a conv into the conv itself:
    bn(conv(x, K)) == conv(x, K * inv) + (bias - mean * inv) with
    inv = scale / sqrt(var + eps). kernel: (..., Cout). Returns f32
    (folded_kernel, folded_bias)."""
    inv = (scale * lax.rsqrt(var + eps)).astype(jnp.float32)
    return kernel.astype(jnp.float32) * inv, bias - mean * inv


def use_fused_bottleneck(H, W, cin, width, cout, itemsize, platform=None):
    # OPT-IN (measured net-negative in-graph, round 3): the kernel beats
    # XLA in isolation (3-block layer1: 5.26 ms vs 7.08 ms device-busy at
    # batch 8 768x1344 bf16) but XLA runs layer1 in a batch-in-sublane
    # {3,0,2,1} activation layout, and the custom call forces standard
    # {3,2,1,0} operands/results, inserting ~2.4 ms of layout copies at
    # the stem/maxpool and layer2 boundaries (full backbone: 20.75 ms
    # fused vs 20.14 ms XLA; end-to-end 196 vs 204 img/s). Kept as the
    # parity-tested base for the transposed-orientation stem+layer1
    # pipeline; enable explicitly to reproduce the measurement.
    if not os.environ.get('KGDET_ENABLE_FUSED_BLOCK'):
        return False
    if os.environ.get('KGDET_DISABLE_PALLAS') \
            or os.environ.get('KGDET_DISABLE_FUSED_BLOCK'):
        return False
    if H % 8 or W % 8 or H < 8:
        return False
    if width % 8 or cin % 8 or cout % LANE:
        return False
    rt = _rows_per_step(H)
    # resident per step: x tiles (double-buffered), a scratch, out tile
    need = 2 * (rt + 2) * W * cin * itemsize \
        + (rt + 2) * (W + 2) * width * itemsize \
        + 2 * rt * W * cout * itemsize \
        + 4 * (cin * width + 9 * width * width + width * cout
               + cin * cout)
    if need > VMEM_BUDGET:
        return False
    if platform is None:
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover - no backend
            return False
    return platform == 'tpu'


def _rows_per_step(H):
    for rt in (16, 8):
        if H % rt == 0:
            return rt
    return 8


def _kernel(xt_ref, xc_ref, xb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            w3_ref, b3_ref, wd_ref, bd_ref, out_ref, a_ref, *, rt, has_ds):
    r = pl.program_id(1)
    nr = pl.num_programs(1)
    W = xc_ref.shape[2]
    cin = xc_ref.shape[3]
    width = a_ref.shape[-1]

    x3 = jnp.concatenate([xt_ref[0], xc_ref[0], xb_ref[0]], axis=0)

    # conv1 (1x1) + bn1 + relu over the tile incl. halo rows
    a = jnp.dot(x3.reshape((rt + 2) * W, cin), w1_ref[...],
                preferred_element_type=jnp.float32)
    a = jnp.maximum(a + b1_ref[0], 0.0).astype(a_ref.dtype)
    a_ref[:, 1:W + 1, :] = a.reshape(rt + 2, W, width)
    a_ref[:, 0:1, :] = jnp.zeros((rt + 2, 1, width), a_ref.dtype)
    a_ref[:, W + 1:W + 2, :] = jnp.zeros((rt + 2, 1, width), a_ref.dtype)

    # conv2 zero-pads a at the image border: the out-of-image halo row of a
    # must be ZERO, not relu(b1) of a zeroed input row
    @pl.when(r == 0)
    def _zero_top():
        a_ref[0:1, :, :] = jnp.zeros((1, W + 2, width), a_ref.dtype)

    @pl.when(r == nr - 1)
    def _zero_bot():
        a_ref[rt + 1:rt + 2, :, :] = jnp.zeros((1, W + 2, width),
                                               a_ref.dtype)

    # conv2 (3x3, zero-pad) + bn2 + relu as 9 shifted tile-level matmuls
    # (Mosaic dislikes 9-way unaligned concats; shifted (rt*W, width) dots
    # hit the MXU with far better shapes anyway), then conv3 + residual.
    acc = jnp.zeros((rt * W, width), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            av = a_ref[dy:dy + rt, dx:dx + W, :].reshape(rt * W, width)
            wk = w2_ref[(3 * dy + dx) * width:(3 * dy + dx + 1) * width, :]
            acc += jnp.dot(av, wk, preferred_element_type=jnp.float32)
    b_t = jnp.maximum(acc + b2_ref[0], 0.0).astype(a_ref.dtype)
    c_t = jnp.dot(b_t, w3_ref[...],
                  preferred_element_type=jnp.float32) + b3_ref[0]
    xt = xc_ref[0].reshape(rt * W, cin)
    if has_ds:
        ident = jnp.dot(xt, wd_ref[...],
                        preferred_element_type=jnp.float32) + bd_ref[0]
    else:
        ident = xt.astype(jnp.float32)
    out = jnp.maximum(c_t + ident, 0.0).astype(out_ref.dtype)
    out_ref[0] = out.reshape(rt, W, out.shape[-1])


def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None,
                     interpret=False):
    """One frozen stride-1 bottleneck block, all intermediates in VMEM.

    x: (B, H, W, cin). w1: (cin, width), w2: (3, 3, width, width),
    w3: (width, cout), wd: (cin, cout) or None (then cin == cout and the
    identity is x itself). b*: (n,) f32 biases with BN pre-folded
    (fold_bn). Returns (B, H, W, cout) in x.dtype. No VJP — frozen
    stages only; callers must stop gradients on every operand.
    """
    B, H, W, cin = x.shape
    width = w1.shape[-1]
    cout = w3.shape[-1]
    rt = _rows_per_step(H)
    has_ds = wd is not None
    dt = x.dtype
    w1c = w1.astype(dt)
    w2c = w2.reshape(9 * width, width).astype(dt)
    w3c = w3.astype(dt)
    wdc = wd.astype(dt) if has_ds else jnp.zeros((1, 1), dt)
    bdc = bd.reshape(1, -1) if has_ds else jnp.zeros((1, 1), jnp.float32)

    def row(i):
        return pl.BlockSpec(
            (1, 1, W, cin),
            functools.partial(
                lambda b, r, i: (b, jnp.clip(r * rt + i, 0, H - 1), 0, 0),
                i=i),
            memory_space=pltpu.VMEM)

    inv = lambda shape: pl.BlockSpec(  # noqa: E731 - grid-invariant block
        shape, lambda b, r: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, rt=rt, has_ds=has_ds),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), dt),
        grid=(B, H // rt),
        in_specs=[
            row(-1),
            pl.BlockSpec((1, rt, W, cin), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            row(rt),
            inv((cin, width)), inv((1, width)),
            inv((9 * width, width)), inv((1, width)),
            inv((width, cout)), inv((1, cout)),
            inv(wdc.shape), inv(bdc.shape),
        ],
        out_specs=pl.BlockSpec((1, rt, W, cout), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rt + 2, W + 2, width), dt)],
        interpret=interpret,
    )(x, x, x, w1c, b1.reshape(1, -1), w2c, b2.reshape(1, -1),
      w3c, b3.reshape(1, -1), wdc, bdc)


def bottleneck_reference(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None):
    """XLA fallback computing exactly what fused_bottleneck computes
    (folded-BN bottleneck); used off-TPU and as the parity oracle."""
    dt = x.dtype
    a = jnp.maximum(
        lax.conv_general_dilated(
            x, w1[None, None].astype(dt), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32) + b1, 0.0).astype(dt)
    b_ = jnp.maximum(
        lax.conv_general_dilated(
            a, w2.astype(dt), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32) + b2, 0.0).astype(dt)
    c = lax.conv_general_dilated(
        b_, w3[None, None].astype(dt), (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32) + b3
    if wd is not None:
        ident = lax.conv_general_dilated(
            x, wd[None, None].astype(dt), (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32) + bd
    else:
        ident = x.astype(jnp.float32)
    return jnp.maximum(c + ident, 0.0).astype(dt)
