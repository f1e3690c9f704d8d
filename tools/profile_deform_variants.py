"""A/B device-busy timing of the deform tap-walk variants.

Round-4 finding #1 (corner-packed arithmetic, KGDET_DEFORM_FWD=v2 —
removed again): packing the four corner rows into one full-occupancy
(4, S, LANE) multiply measured within 6% of the naive per-corner lerp
(k9 0.483 -> 0.495, k25 1.203 -> 1.236, k49 3.720 -> 3.505, split83
11.852 -> 11.861 ms device-busy) — the walk is LOAD-issue bound
(~4.7 ns per dynamic load), not VPU-arith bound.

Variant 'pair' therefore halves the load count instead: the slab is
pre-paired so feat[r] carries row r AND row r+W, and one ds(r0, 2) load
fetches all four bilinear corners (ops/pallas_deform.pair_rows).

This tool traces the fused per-column kernels (k9/k25/k49, the inference
path) and the shared 83-tap split kernel (the training-forward path) under
KGDET_DEFORM_FWD=v1 and =pair and prints device-busy ms per call, plus an
output parity check.

Usage (TPU): python tools/profile_deform_variants.py [--iters 6]
"""
from __future__ import annotations

import argparse
import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

import jax
import jax.numpy as jnp
import numpy as np


def make_feeds(n, B, H, W, C, K, F, dtype, seed=0):
    rng = np.random.RandomState(seed)
    feeds = []
    for _ in range(n):
        feat = jnp.asarray(rng.randn(B, H, W, C), dtype)
        pos = jnp.asarray(
            np.stack([rng.uniform(-1, H, (B, H * W, K)),
                      rng.uniform(-1, W, (B, H * W, K))], -1), jnp.float32)
        w = jnp.asarray(rng.randn(K, C, F) * 0.05, dtype)
        feeds.append((feat, pos, w))
    jax.block_until_ready(feeds)
    return feeds


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=6)
    p.add_argument('--split-only', action='store_true',
                   help='skip the fused kernels (and their parity check)')
    p.add_argument('--variants', default='v1,pair,vw')
    p.add_argument('--dual-only', action='store_true',
                   help='measure only the dual-path training forward')
    p.add_argument('--grad', action='store_true',
                   help='also time value_and_grad through the whole dual '
                        'block (fwd + _columns_dual_bwd incl. the '
                        'layout-dependent weight-grad einsums)')
    args = p.parse_args()

    from trace_piece import device_time_ms

    B, H, W, C, F = 8, 24, 42, 256, 256
    dtype = jnp.bfloat16
    results = {}

    for variant in args.variants.split(','):
        os.environ['KGDET_DEFORM_FWD'] = variant
        import kgdet_tpu.ops.pallas_deform as pd
        importlib.reload(pd)

        for K in () if (args.split_only or args.dual_only) else (9, 25, 49):
            feeds = make_feeds(args.iters + 1, B, H, W, C, K, F, dtype)
            fn = jax.jit(pd._fused_impl)
            out = fn(*feeds[0])
            jax.block_until_ready(out)
            ms = device_time_ms(fn, feeds)
            results[f'fused_k{K}_{variant}'] = round(ms, 3)
            results.setdefault(f'fused_k{K}_out_{variant}',
                               float(jnp.sum(jnp.abs(
                                   out.astype(jnp.float32)))))
            print(f'fused_k{K} {variant}: {ms:.3f} ms', flush=True)

        # shared split gather over the cls|pts concat (83 taps, 2C lanes)
        taps = (9, 25, 49)
        K = sum(taps)
        feeds = make_feeds(args.iters + 1, B, H, W, C, K, F, dtype, seed=1)

        def split_fn(feat, pos, w, pd=pd, taps=taps):
            outs = pd.deform_sample_split_pallas(feat, feat, pos, taps)
            return [o for pair in outs for o in pair]

        if not args.dual_only:
            fn = jax.jit(split_fn)
            out = fn(*feeds[0])
            jax.block_until_ready(out)
            ms = device_time_ms(fn, feeds)
            results[f'split83_{variant}'] = round(ms, 3)
            print(f'split83 {variant}: {ms:.3f} ms', flush=True)

        # training forward through the dual path's vjp rule: split gather
        # + per-column contractions, column residuals materialized (raw
        # pixels-in-sublanes layout under vw, transposed (B,P,t,C) else)
        wc = tuple(jnp.asarray(
            np.random.RandomState(2 + i).randn(t, C, F) * 0.05, dtype)
            for i, t in enumerate(taps))

        def dual_fwd(feat, pos, w, pd=pd, taps=taps, wc=wc):
            (cls_cat, kpt_cat), res = pd._columns_dual_fwd(
                feat, feat, pos, wc, wc, taps)
            return cls_cat, kpt_cat, res[0]

        fn = jax.jit(dual_fwd)
        out = fn(*feeds[0])
        jax.block_until_ready(out)
        ms = device_time_ms(fn, feeds)
        results[f'dualfwd83_{variant}'] = round(ms, 3)
        print(f'dualfwd83 {variant}: {ms:.3f} ms', flush=True)

        if args.grad:
            # the REAL training cost of one deform block: forward +
            # backward through the block-level dual custom_vjp — covers
            # the split gather, the column contractions, the cotangent
            # reassembly + fused deform backward, AND the weight-grad
            # einsums whose lowering depends on the column layout (raw
            # 6-d under vw, transposed 4-d otherwise)
            def dual_loss(feat, pos, wcol, pd=pd, taps=taps):
                (cls_cat, kpt_cat) = pd.deform_columns_dual(
                    feat, feat, pos, wcol, wcol, taps)
                return (jnp.sum(jnp.abs(cls_cat.astype(jnp.float32)))
                        + jnp.sum(jnp.abs(kpt_cat.astype(jnp.float32))))

            gfn = jax.jit(jax.value_and_grad(dual_loss, argnums=(0, 1, 2)))

            def gcall(feat, pos, w, gfn=gfn, wc=wc):
                return gfn(feat, pos, wc)

            out = gcall(*feeds[0])
            jax.block_until_ready(out)
            ms = device_time_ms(gcall, feeds)
            results[f'dualvjp83_{variant}'] = round(ms, 3)
            print(f'dualvjp83 {variant}: {ms:.3f} ms', flush=True)

    ran = [v for v in args.variants.split(',')
           if f'fused_k9_out_{v}' in results]
    for K in () if len(ran) < 2 else (9, 25, 49):
        a = results[f'fused_k{K}_out_{ran[0]}']
        for v in ran[1:]:
            b = results[f'fused_k{K}_out_{v}']
            assert abs(a - b) <= 1e-3 * max(abs(a), 1.0), (K, v, a, b)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
