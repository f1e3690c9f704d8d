"""Device-time A/B of deformable fused-kernel variants (KGDet shapes).

The fused inference path currently issues one pallas_call per (batch
element, column, branch) = 48 calls per cascade block, each re-loading the
feature slab. Candidate variants measured here with xplane device time
(wall-clock through the tunnel is unreliable at this scale):

  base     current deform_columns_dual inference primal
  bgrid    batched grid (B, n_pt): one call per (column, branch); slab
           block double-buffered along the batch grid dim
  flat     bgrid + flattened (HW*S, LANE) slab so each corner-pair is ONE
           (2S, LANE) dynamic load instead of a (2, S, LANE) indexed load
  split    shared split-gather + XLA einsum contractions (train fwd path)

Run on the real chip: python tools/bench_deform_variants.py
"""
from __future__ import annotations

import functools
import sys

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kgdet_tpu.ops.pallas_deform import (
    LANE, TPF, _fused_kernel, _prep_indices, deform_columns_dual)
from tools.trace_piece import device_time_ms

B, H, W, C, F = 8, 24, 42, 256, 256
TAPS = (9, 25, 49)


def fused_batched(feat, pos_yx, weight, *, tpf=TPF):
    """_fused_impl with the batch element as a leading grid dimension."""
    Bq, Hq, Wq, Cq = feat.shape
    _, P, K, _ = pos_yx.shape
    Fq = weight.shape[-1]
    S = Cq // LANE
    starts, w4 = _prep_indices(pos_yx, Hq, Wq)
    P_pad = -(-P // tpf) * tpf
    if P_pad != P:
        pad = [(0, 0), (0, P_pad - P), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad)
        w4 = jnp.pad(w4, pad)
    n_pt = P_pad // tpf
    starts = starts.reshape(Bq, n_pt, tpf, K * 2)
    w4 = w4.reshape(Bq, n_pt, tpf, K * 4)
    feat_r = feat.reshape(Bq, Hq * Wq, S, LANE)
    wt = weight.reshape(K, S, LANE, Fq).transpose(1, 0, 2, 3) \
        .reshape(S, K * LANE, Fq).astype(feat.dtype)

    out = pl.pallas_call(
        functools.partial(_fused_kernel, K=K, S=S),
        out_shape=jax.ShapeDtypeStruct((Bq, P_pad, Fq), feat.dtype),
        grid=(Bq, n_pt),
        in_specs=[
            pl.BlockSpec((1, 1, tpf, K * 2), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tpf, K * 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hq * Wq, S, LANE), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K * LANE, Fq), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tpf, Fq), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, tpf, K * LANE), feat.dtype)],
    )(starts, w4, feat_r, wt)
    return out[:, :P] if P_pad != P else out


def _flat_kernel(starts_ref, w_ref, feat_ref, wt_ref, out_ref, scratch_ref,
                 *, K, S, tpf):
    """Like _fused_kernel but the slab is (HW*S, LANE): a corner pair is a
    single (2S, LANE) dynamic load; corner rows r and r+1 differ by S."""
    def body(pg, _):
        base = pg * 8
        for k in range(K):
            rows = []
            for pr in range(8):
                p = base + pr
                r0 = starts_ref[0, 0, p, 2 * k]
                r1 = starts_ref[0, 0, p, 2 * k + 1]
                w00 = w_ref[0, 0, p, 4 * k]
                w01 = w_ref[0, 0, p, 4 * k + 1]
                w10 = w_ref[0, 0, p, 4 * k + 2]
                w11 = w_ref[0, 0, p, 4 * k + 3]
                top = feat_ref[0, pl.ds(r0 * S, 2 * S)]   # (2S, LANE)
                bot = feat_ref[0, pl.ds(r1 * S, 2 * S)]
                t = top.astype(jnp.float32)
                b = bot.astype(jnp.float32)
                val = (t[:S] * w00 + t[S:] * w01
                       + b[:S] * w10 + b[S:] * w11)      # (S, LANE)
                rows.append(val.astype(scratch_ref.dtype))
            tile = jnp.stack(rows)                        # (8, S, LANE)
            for s in range(S):
                scratch_ref[s, pl.ds(base, 8), pl.ds(k * LANE, LANE)] = \
                    tile[:, s, :]
        return 0

    lax.fori_loop(0, tpf // 8, body, 0)
    acc = jnp.dot(scratch_ref[0], wt_ref[0],
                  preferred_element_type=jnp.float32)
    for s in range(1, S):
        acc += jnp.dot(scratch_ref[s], wt_ref[s],
                       preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def fused_flat(feat, pos_yx, weight, *, tpf=TPF):
    Bq, Hq, Wq, Cq = feat.shape
    _, P, K, _ = pos_yx.shape
    Fq = weight.shape[-1]
    S = Cq // LANE
    starts, w4 = _prep_indices(pos_yx, Hq, Wq)
    P_pad = -(-P // tpf) * tpf
    if P_pad != P:
        pad = [(0, 0), (0, P_pad - P), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad)
        w4 = jnp.pad(w4, pad)
    n_pt = P_pad // tpf
    starts = starts.reshape(Bq, n_pt, tpf, K * 2)
    w4 = w4.reshape(Bq, n_pt, tpf, K * 4)
    feat_r = feat.reshape(Bq, Hq * Wq * S, LANE)
    wt = weight.reshape(K, S, LANE, Fq).transpose(1, 0, 2, 3) \
        .reshape(S, K * LANE, Fq).astype(feat.dtype)

    out = pl.pallas_call(
        functools.partial(_flat_kernel, K=K, S=S, tpf=tpf),
        out_shape=jax.ShapeDtypeStruct((Bq, P_pad, Fq), feat.dtype),
        grid=(Bq, n_pt),
        in_specs=[
            pl.BlockSpec((1, 1, tpf, K * 2), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tpf, K * 4), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hq * Wq * S, LANE), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, K * LANE, Fq), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tpf, Fq), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, tpf, K * LANE), feat.dtype)],
    )(starts, w4, feat_r, wt)
    return out[:, :P] if P_pad != P else out


def fused_perbatch(feat, pos_yx, weight, *, tpf=TPF):
    """_fused_impl layout (one call per batch element, slab single-buffered)
    but with a configurable pixels-per-grid-step tile."""
    Bq, Hq, Wq, Cq = feat.shape
    _, P, K, _ = pos_yx.shape
    Fq = weight.shape[-1]
    S = Cq // LANE
    starts, w4 = _prep_indices(pos_yx, Hq, Wq)
    P_pad = -(-P // tpf) * tpf
    if P_pad != P:
        pad = [(0, 0), (0, P_pad - P), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad)
        w4 = jnp.pad(w4, pad)
    n_pt = P_pad // tpf
    starts = starts.reshape(Bq, n_pt, tpf, K * 2)
    w4 = w4.reshape(Bq, n_pt, tpf, K * 4)
    feat_r = feat.reshape(Bq, Hq * Wq, S, LANE)
    wt = weight.reshape(K, S, LANE, Fq).transpose(1, 0, 2, 3) \
        .reshape(S, K * LANE, Fq).astype(feat.dtype)
    outs = []
    for b in range(Bq):
        outs.append(pl.pallas_call(
            functools.partial(_fused_kernel, K=K, S=S),
            out_shape=jax.ShapeDtypeStruct((1, P_pad, Fq), feat.dtype),
            grid=(n_pt,),
            in_specs=[
                pl.BlockSpec((1, 1, tpf, K * 2),
                             lambda t, b=b: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, tpf, K * 4),
                             lambda t, b=b: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Hq * Wq, S, LANE),
                             lambda t, b=b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, K * LANE, Fq), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tpf, Fq), lambda t: (0, t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, tpf, K * LANE), feat.dtype)],
        )(starts, w4, feat_r, wt))
    out = jnp.concatenate(outs, axis=0) if Bq > 1 else outs[0]
    return out[:, :P] if P_pad != P else out


def make_feeds(n, dtype=jnp.bfloat16, seed=0):
    rng = np.random.RandomState(seed)
    feeds = []
    P = H * W
    K = sum(TAPS)
    for i in range(n):
        cls_feat = jnp.asarray(
            rng.randn(B, H, W, C).astype(np.float32), dtype)
        pts_feat = jnp.asarray(
            rng.randn(B, H, W, C).astype(np.float32), dtype)
        gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing='ij')
        centers = np.stack([gy, gx], -1).reshape(1, P, 1, 2)
        pos = centers + rng.randn(B, P, K, 2) * 3.0
        feeds.append((cls_feat, pts_feat,
                      jnp.asarray(pos.astype(np.float32))))
    return feeds


def main():
    K = sum(TAPS)
    rng = np.random.RandomState(1)
    w_cls = tuple(jnp.asarray(rng.randn(t, C, F).astype(np.float32) * .01,
                              jnp.bfloat16) for t in TAPS)
    w_pts = tuple(jnp.asarray(rng.randn(t, C, F).astype(np.float32) * .01,
                              jnp.bfloat16) for t in TAPS)
    feeds = make_feeds(6)

    def run_cols(fused_fn):
        def f(cls_feat, pts_feat, pos):
            outs_c, outs_p = [], []
            lo = 0
            for ci, t in enumerate(TAPS):
                pcol = pos[:, :, lo:lo + t]
                lo += t
                outs_c.append(fused_fn(cls_feat, pcol, w_cls[ci]))
                outs_p.append(fused_fn(pts_feat, pcol, w_pts[ci]))
            return (jnp.concatenate(outs_c, -1), jnp.concatenate(outs_p, -1))
        return jax.jit(f)

    base = jax.jit(lambda c, p, pos: deform_columns_dual(
        c, p, pos, w_cls, w_pts, TAPS))
    variants = {
        'base': base,
        'perbatch_tpf256': run_cols(functools.partial(fused_perbatch,
                                                      tpf=256)),
        'bgrid_tpf256': run_cols(functools.partial(fused_batched, tpf=256)),
        'bgrid_tpf512': run_cols(functools.partial(fused_batched, tpf=512)),
    }

    ref = None
    for name, fn in variants.items():
        try:
            out = jax.block_until_ready(fn(*feeds[0]))
        except Exception as e:
            print(f'{name:14s} FAILED: {type(e).__name__}: {e}')
            continue
        if ref is None:
            ref = out
        else:
            err = max(float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32))))
                for a, b in zip(ref, out))
            if err > 1e-2:
                print(f'{name:14s} MISMATCH max|d|={err}')
                continue
        ms = device_time_ms(fn, feeds)
        print(f'{name:14s} {ms:7.3f} ms/block-equivalent')


if __name__ == '__main__':
    main()
