"""Transposed-orientation stem -> maxpool -> layer1 Pallas pipeline.

Round-3 measurements (docs/design.md §9) left two backbone costs XLA
cannot remove:
  * the 7x7/2 stem conv runs the MXU at 6/128 contraction density even
    width-packed (4.0 ms device-busy at batch 8 768x1344 — ~21x the
    nominal FLOPs), because XLA keeps channels in lanes;
  * the fused frozen-bottleneck kernel (ops/pallas_resblock.py) wins in
    isolation but loses ~2.4 ms to layout copies where XLA's
    batch-in-sublane conv layout meets the custom call's standard layout.

This module runs the whole frozen prefix — stem conv (+folded
FrozenBN/relu), 3x3/2 maxpool, and the three layer1 bottlenecks — as a
chain of Pallas kernels over ONE interior layout, so the only layout
transitions are at the image entry (small) and the layer1 exit (one XLA
transpose feeding layer2):

  interior activation layout: (B, H4, C, W4)
    - C (channels) in SUBLANES, one spatial row's width in LANES (rows
      keep their own dim: every BlockSpec's trailing (C, W4) then equals
      the array dims, which Mosaic requires when W4 % 128 != 0 — a
      flattened 8*W4 lane dim would make one-row halo blocks illegal);
    - 1x1 convs become per-row (Cout, Cin) @ (Cin, W4) MXU matmuls with
      zero layout waste;
    - the 3x3 conv is 9 statically-shifted matmuls over a bordered
      (width, 10*(W4+2)+2) VMEM scratch holding 8 rows + halos (one zero
      lane between rows).

  stem: per output row, two patch-TRANSPOSED im2col (192, W4) scratches
  (even / odd output columns) are built with static-lane-shifted (6, W4)
  copies from the VMEM-resident even/odd width-packed input planes
  (B-loop'd; (H+8, 2, 6, W4+2) stays resident), and two
  (64, 192) @ (192, W4) matmuls compute the row — contraction density
  192/256 instead of 6/128. Splitting even/odd output columns up front
  makes the 3x3/2 maxpool's x-stride a pair of STATIC shifted slices
  (max(odd[j-1], even[j], odd[j])) — Mosaic cannot lower a lane-dim
  deinterleave (vector reshape (C, Wp) -> (C, W4, 2)), so the stride
  must never appear as a vector op. The -inf-pad maxpool folds into the
  same kernel (relu output is >= 0, so zero padding is equivalent).

All weights arrive with FrozenBatchNorm folded (exact for frozen stats);
the chain has no VJP and is only used for frozen stages, like
ops/pallas_resblock.py.

Parity reference: mmdetection/mmdet/models/backbones/resnet.py:86-266
(Bottleneck, eval-mode BN) and the stem at resnet.py:382-401; the XLA
oracle here is models/resnet.s2d_stem_conv + max_pool_3x3_s2 +
ops/pallas_resblock.bottleneck_reference.
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
ROWS_PER_STEP = 8          # spatial rows flattened into one lane block


def use_stem_pipeline(B, H, W, itemsize, platform=None):
    """Gate: full-chain eligibility (shape divisibility + VMEM fit)."""
    if os.environ.get('KGDET_DISABLE_PALLAS') \
            or os.environ.get('KGDET_DISABLE_STEM_PIPELINE'):
        return False
    if H % (4 * ROWS_PER_STEP) or W % 4:
        return False
    W4 = W // 4
    lane = lambda n: -(-n // LANE) * LANE        # noqa: E731  VMEM lane pad
    # stem: resident even/odd packed planes + rows scratch + two patch
    # scratches + double-buffered out block
    stem_need = (H + 8) * 2 * 8 * lane(W4 + 2) * itemsize \
        + 17 * 2 * 64 * lane(W4) * itemsize \
        + 2 * 192 * lane(W4) * itemsize \
        + 2 * 64 * ROWS_PER_STEP * W4 * itemsize
    # block: center+out x2 (double-buffered) + halos + bordered scratch +
    # weights (worst case Cin=256, 2x safety on the weight term)
    blk_need = 2 * 2 * 256 * ROWS_PER_STEP * lane(W4) * itemsize \
        + 4 * 256 * lane(W4) * itemsize \
        + 64 * lane((ROWS_PER_STEP + 2) * (W4 + 2) + 2) * itemsize \
        + 2 * (9 * 64 * 64 + 2 * 64 * 256 + 256 * 256) * itemsize
    if max(stem_need, blk_need) > 13 * 2 ** 20:
        return False
    if platform is None:
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover - no backend
            return False
    return platform == 'tpu'


def prep_stem_weight(w7733, dtype):
    """(7, 7, 3, 64) folded-BN stem kernel -> (64, 192) matmul lhs whose K
    order matches the patch scratch: (dy, dxp, packed-channel)."""
    w_pad = jnp.pad(w7733, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,3,64)
    wd = w_pad.reshape(8, 4, 6, 64).reshape(192, 64)
    return jnp.transpose(wd, (1, 0)).astype(dtype)


def prep_stem_input(x):
    """Normalized image (B, H, W, 3) -> even/odd width-packed transposed
    padded planes (B, H+8, 2, 6, W/4+2): channels in sublanes, packed-x
    quads in lanes; plane 0 holds even packed lanes (original pixels
    4j..4j+1), plane 1 odd (4j+2..4j+3)."""
    B, H, W, _ = x.shape
    xr = x.reshape(B, H, W // 4, 2, 6)
    xr = jnp.pad(xr, ((0, 0), (4, 4), (1, 1), (0, 0), (0, 0)))
    return xr.transpose(0, 1, 3, 4, 2)


# (plane, lane shift) feeding patch slot dxp, for even / odd output
# columns: even stem col 2j reads padded-packed lanes 2j+dxp, odd col
# 2j+1 reads 2j+1+dxp; in the split planes those are contiguous slices.
_EVEN_TAPS = ((0, 0), (1, 0), (0, 1), (1, 1))
_ODD_TAPS = ((1, 0), (0, 1), (1, 1), (0, 2))


def _stem_kernel(in_ref, wt_ref, b_ref, out_ref, pe_ref, po_ref, rows_ref,
                 *, W4, H2):
    """One step: 17 stem rows (two patchT builds + two matmuls each: even
    and odd output columns), 3x3/2 maxpool over them, 8 pooled rows into
    the flattened-lane out block."""
    s = pl.program_id(0)
    base = s * 2 * ROWS_PER_STEP - 1        # stem row held by rows_ref[0]

    def stem_row(j, _):
        o = base + j

        @pl.when((o >= 0) & (o < H2))
        def _():
            for dy in range(8):
                for dxp in range(4):
                    slot = (dy * 4 + dxp) * 6
                    epl, esh = _EVEN_TAPS[dxp]
                    opl, osh = _ODD_TAPS[dxp]
                    pe_ref[slot:slot + 6, :] = \
                        in_ref[2 * o + dy, epl, :, esh:esh + W4]
                    po_ref[slot:slot + 6, :] = \
                        in_ref[2 * o + dy, opl, :, osh:osh + W4]
            for half, patch in ((0, pe_ref), (1, po_ref)):
                acc = jnp.dot(wt_ref[...], patch[...],
                              preferred_element_type=jnp.float32)
                rows_ref[j, half] = jnp.maximum(
                    acc + b_ref[...], 0.0).astype(rows_ref.dtype)

        @pl.when(~((o >= 0) & (o < H2)))
        def _():
            z = jnp.zeros(rows_ref.shape[2:], rows_ref.dtype)
            rows_ref[j, 0] = z
            rows_ref[j, 1] = z
        return 0

    lax.fori_loop(0, 2 * ROWS_PER_STEP + 1, stem_row, 0)

    for i in range(ROWS_PER_STEP):
        r3e = jnp.maximum(
            jnp.maximum(rows_ref[2 * i, 0], rows_ref[2 * i + 1, 0]),
            rows_ref[2 * i + 2, 0])                    # (64, W4) even cols
        r3o = jnp.maximum(
            jnp.maximum(rows_ref[2 * i, 1], rows_ref[2 * i + 1, 1]),
            rows_ref[2 * i + 2, 1])                    # odd cols
        # pooled[j] = max(stem[2j-1], stem[2j], stem[2j+1])
        #           = max(r3o[j-1], r3e[j], r3o[j]); zero pad at j=0 is
        # exact (relu'd operands are >= 0, -inf pad semantics preserved)
        r3o_prev = jnp.concatenate(
            [jnp.zeros((64, 1), r3o.dtype), r3o[:, :W4 - 1]], axis=1)
        pooled = jnp.maximum(jnp.maximum(r3o_prev, r3e), r3o)
        out_ref[i] = pooled.astype(out_ref.dtype)


def stem_pool_transposed(x, stem_w, stem_b, interpret=False):
    """Image (B, H, W, 3) float -> pooled stage-0 input in the interior
    layout (B, H4, 64, W4). stem_w/stem_b: folded-BN stem conv
    (7,7,3,64)/(64,) from pallas_resblock.fold_bn."""
    B, H, W, _ = x.shape
    dt = x.dtype
    W4 = W // 4
    H2, H4 = H // 2, H // 4
    n_steps = H4 // ROWS_PER_STEP
    xin = prep_stem_input(x)
    wt = prep_stem_weight(stem_w.astype(jnp.float32), dt)
    bias = stem_b.reshape(64, 1).astype(jnp.float32)

    outs = []
    for b in range(B):
        outs.append(pl.pallas_call(
            functools.partial(_stem_kernel, W4=W4, H2=H2),
            out_shape=jax.ShapeDtypeStruct((H4, 64, W4), dt),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((H + 8, 2, 6, W4 + 2), lambda s: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 192), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 1), lambda s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS_PER_STEP, 64, W4),
                                   lambda s: (s, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((192, W4), dt),
                pltpu.VMEM((192, W4), dt),
                pltpu.VMEM((2 * ROWS_PER_STEP + 1, 2, 64, W4), dt),
            ],
            interpret=interpret,
        )(xin[b], wt, bias))
    return jnp.stack(outs)


def _block_kernel(xp_ref, xc_ref, xn_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  w3_ref, b3_ref, wd_ref, bd_ref, out_ref, a_ref,
                  *, W4, width, has_ds):
    """One transposed bottleneck step: conv1 per row into a bordered row
    scratch, conv2 as 9 statically-shifted matmuls, conv3 + identity +
    relu per row."""
    s = pl.program_id(1)
    ns = pl.num_programs(1)
    R = ROWS_PER_STEP
    stride = W4 + 2

    def c1(rhs):
        v = jnp.dot(w1_ref[...], rhs, preferred_element_type=jnp.float32)
        return jnp.maximum(v + b1_ref[...], 0.0).astype(a_ref.dtype)

    a_ref[...] = jnp.zeros(a_ref.shape, a_ref.dtype)
    for r in range(R):
        a_ref[:, (1 + r) * stride + 1:(1 + r) * stride + 1 + W4] = \
            c1(xc_ref[0, r])

    @pl.when(s > 0)
    def _():
        a_ref[:, 1:1 + W4] = c1(xp_ref[0, 0])           # prev last row

    @pl.when(s < ns - 1)
    def _():
        a_ref[:, (R + 1) * stride + 1:(R + 1) * stride + 1 + W4] = \
            c1(xn_ref[0, 0])                            # next first row

    acc = jnp.zeros((width, R * stride), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            rhs = a_ref[:, dy * stride + dx:
                        dy * stride + dx + R * stride]
            acc = acc + jnp.dot(
                w2_ref[3 * dy + dx], rhs,
                preferred_element_type=jnp.float32)
    b_act = jnp.maximum(acc + b2_ref[...], 0.0).astype(a_ref.dtype)

    c3 = jnp.dot(w3_ref[...], b_act,
                 preferred_element_type=jnp.float32) + b3_ref[...]
    # c3 column j corresponds to bordered position j = r*stride + x
    # (every tap's slice has the same length, only the start shifts), so
    # stripping the border slots is a static per-row re-slice.
    for r in range(R):
        if has_ds:
            ident = jnp.dot(wd_ref[...], xc_ref[0, r],
                            preferred_element_type=jnp.float32) \
                + bd_ref[...]
        else:
            ident = xc_ref[0, r].astype(jnp.float32)
        piece = c3[:, r * stride:r * stride + W4]
        out_ref[0, r] = jnp.maximum(piece + ident, 0.0).astype(
            out_ref.dtype)


def bottleneck_transposed(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None,
                          interpret=False):
    """One frozen stride-1 bottleneck in the interior layout.

    x: (B, H4, Cin, W4). w1: (width, Cin) folded; w2: (9, width,
    width) tap-major (dy*3+dx), i.e. torch (3,3,width,width) HWIO ->
    transpose to (tap, Cout, Cin); w3: (Cout, width); wd: (Cout, Cin) or
    None. Biases f32. Returns (B, H4, Cout, W4).
    """
    B, H4, Cin, W4 = x.shape
    R = ROWS_PER_STEP
    n_steps = H4 // R
    width = w1.shape[0]
    Cout = w3.shape[0]
    dt = x.dtype
    has_ds = wd is not None
    col = lambda v: v.reshape(-1, 1).astype(jnp.float32)  # noqa: E731
    args = (w1.astype(dt), col(b1), w2.astype(dt), col(b2),
            w3.astype(dt), col(b3),
            wd.astype(dt) if has_ds else jnp.zeros((1, 1), dt),
            col(bd) if has_ds else jnp.zeros((1, 1), jnp.float32))

    def inv(shape):
        return pl.BlockSpec(shape, lambda b, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_block_kernel, W4=W4, width=width, has_ds=has_ds),
        out_shape=jax.ShapeDtypeStruct((B, H4, Cout, W4), dt),
        grid=(B, n_steps),
        in_specs=[
            # prev step's LAST row / own R rows / next step's FIRST row
            # (row-dim block size 1: the index map addresses single rows)
            pl.BlockSpec((1, 1, Cin, W4),
                         lambda b, s: (b, jnp.maximum(s * ROWS_PER_STEP - 1,
                                                      0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_PER_STEP, Cin, W4),
                         lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cin, W4),
                         lambda b, s, h=H4: (
                             b, jnp.minimum(s * ROWS_PER_STEP
                                            + ROWS_PER_STEP, h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            inv((width, Cin)), inv((width, 1)),
            inv((9, width, width)), inv((width, 1)),
            inv((Cout, width)), inv((Cout, 1)),
            inv(args[6].shape), inv(args[7].shape),
        ],
        out_specs=pl.BlockSpec((1, ROWS_PER_STEP, Cout, W4),
                               lambda b, s: (b, s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # +2: the dy=2,dx=2 tap slice ends at (R+2)*stride + 2; the two
            # extra zero columns only feed stripped border positions
            pltpu.VMEM((width, (ROWS_PER_STEP + 2) * (W4 + 2) + 2), dt)],
        interpret=interpret,
    )(x, x, x, *args)


def to_interior(x):
    """Standard NHWC (B, H4, W4, C) -> interior layout (B, H4, C, W4);
    inverse of from_interior (test/entry helper)."""
    return x.transpose(0, 1, 3, 2)


def from_interior(y):
    """(B, H4, C, W4) interior layout -> standard NHWC (B, H4, W4, C) —
    ONE exit transpose XLA fuses with layer2's own layout choice."""
    return y.transpose(0, 1, 3, 2)


def stem_layer1_pipeline(x, stem_w, stem_b, blocks, interpret=False):
    """Full frozen prefix: image -> layer1 output (B, H/4, W/4, 256).

    blocks: list of 3 dicts with folded weights
      {w1 (width, Cin), b1, w2 (9, width, width), b2, w3 (Cout, width),
       b3, wd (Cout, Cin) | None, bd | None}.
    """
    y = stem_pool_transposed(x, stem_w, stem_b, interpret=interpret)
    for blk in blocks:
        y = bottleneck_transposed(
            y, blk['w1'], blk['b1'], blk['w2'], blk['b2'], blk['w3'],
            blk['b3'], blk.get('wd'), blk.get('bd'), interpret=interpret)
    return from_interior(y)


def transpose_folded(w1, b1, w2, b2, w3, b3, wd=None, bd=None):
    """Folded weights in the bottleneck_reference convention (w1 (Cin,
    width), w2 (3,3,width,width) HWIO, w3 (width,Cout), wd (Cin,Cout)) ->
    the transposed-matmul dict bottleneck_transposed expects."""
    out = {
        'w1': jnp.transpose(w1, (1, 0)),
        'b1': b1,
        # (ky, kx, Cin, Cout) -> (tap, Cout, Cin)
        'w2': jnp.transpose(w2.reshape(9, w2.shape[2], w2.shape[3]),
                            (0, 2, 1)),
        'b2': b2,
        'w3': jnp.transpose(w3, (1, 0)),
        'b3': b3,
    }
    if wd is not None:
        out['wd'] = jnp.transpose(wd, (1, 0))
        out['bd'] = bd
    return out
