"""Microbenchmark: deformable-sampling fwd/bwd kernel cost at head shapes.

Times the Pallas sampling forward and the fused backward (_deform_bwd_pallas)
standalone at the KGDet cascade hot shape — per-(column, branch) calls for
kernel comparison, plus the REAL training issue pattern (one 83-tap backward
over the cls|pts concat per block, the _columns_dual_bwd call) so the deform
share of the train-step backward can be read directly. Distinct feeds per
iteration (the tunnel may memoize repeated identical calls).

Usage: python tools/profile_deform_bwd.py [--iters 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, feeds, iters):
    """Device-busy ms per call from an xplane trace (kernel truth; wall
    clock through the tunnel under-reports sub-ms pieces)."""
    sys.path.insert(0, os.path.join(REPO, 'tools'))
    from trace_piece import device_time_ms
    iters = min(iters, len(feeds) - 1)
    return device_time_ms(fn, feeds[:iters + 1]) / 1e3   # -> seconds


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=8)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--variants', default='v1,v2,vw')
    args = p.parse_args()

    from kgdet_tpu.ops.pallas_deform import (_deform_bwd_pallas,
                                             deform_sample_pallas)

    B, H, W, C = args.batch, 24, 42, 256   # stride-32 level, one branch
    P = H * W
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    n = args.iters + 1

    report = {}
    # the cascade issues one call per column per branch: taps 9/25/49 x2
    for K in (9, 25, 49):
        feat_feeds = [(
            jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(dtype),
            jnp.asarray(
                rng.uniform(0, [H - 1, W - 1], (B, P, K, 2)).astype(np.float32)),
            jnp.asarray(rng.randn(B, P, K, C).astype(np.float32)).astype(dtype),
        ) for _ in range(n)]

        fwd = jax.jit(lambda f, pos, g: deform_sample_pallas(f, pos))
        t_f = timed(fwd, feat_feeds, args.iters)
        report[f'fwd_k{K}'] = round(t_f * 1e3, 3)
        outs = {}
        for ver in args.variants.split(','):
            os.environ['KGDET_DEFORM_BWD'] = ver
            bwd = jax.jit(lambda f, pos, g: _deform_bwd_pallas(f, pos, g))
            t_b = timed(bwd, feat_feeds, args.iters)
            report[f'bwd_{ver}_k{K}'] = round(t_b * 1e3, 3)
            gf, gp = bwd(*feat_feeds[0])
            outs[ver] = (float(jnp.sum(jnp.abs(gf.astype(jnp.float32)))),
                         float(jnp.sum(jnp.abs(gp))))
        os.environ.pop('KGDET_DEFORM_BWD', None)
        vs = args.variants.split(',')
        for ver in vs[1:]:   # generations must agree on real outputs
            for a, b in zip(outs[vs[0]], outs[ver]):
                assert abs(a - b) <= 2e-3 * max(abs(a), 1.0), \
                    (K, ver, outs[vs[0]], outs[ver])
        report[f'bwd_k{K}'] = report[f'bwd_{vs[-1]}_k{K}']
        print(json.dumps({'K': K, 'fwd_ms': report[f'fwd_k{K}'],
                          **{f'bwd_{v}_ms': report[f'bwd_{v}_k{K}']
                             for v in vs}}), flush=True)

    # per-block totals in the per-(column, branch) issue pattern, and the
    # whole cascade (2 deform blocks)
    blk_f = sum(report[f'fwd_k{k}'] for k in (9, 25, 49)) * 2
    blk_b = sum(report[f'bwd_k{k}'] for k in (9, 25, 49)) * 2
    print(json.dumps({'cascade_deform_fwd_ms': round(blk_f * 2, 2),
                      'cascade_deform_bwd_ms': round(blk_b * 2, 2),
                      'batch': B}), flush=True)

    # the REAL training issue pattern: the dual path's vjp runs ONE
    # backward over the cls|pts concat per block — K=83 taps, 2C=512
    # channels (_columns_dual_bwd) — so this line, x2 blocks, is the
    # deform-bwd share of the actual train step
    K = 83
    feeds = [(
        jnp.asarray(rng.randn(B, H, W, 2 * C).astype(np.float32))
        .astype(dtype),
        jnp.asarray(
            rng.uniform(0, [H - 1, W - 1], (B, P, K, 2)).astype(np.float32)),
        jnp.asarray(rng.randn(B, P, K, 2 * C).astype(np.float32))
        .astype(dtype),
    ) for _ in range(n)]
    outs = {}
    for ver in args.variants.split(','):
        os.environ['KGDET_DEFORM_BWD'] = ver
        bwd = jax.jit(lambda f, pos, g: _deform_bwd_pallas(f, pos, g))
        t_b = timed(bwd, feeds, args.iters)
        report[f'bwd_{ver}_concat83'] = round(t_b * 1e3, 3)
        gf, gp = bwd(*feeds[0])
        outs[ver] = (float(jnp.sum(jnp.abs(gf.astype(jnp.float32)))),
                     float(jnp.sum(jnp.abs(gp))))
    os.environ.pop('KGDET_DEFORM_BWD', None)
    vs = args.variants.split(',')
    for ver in vs[1:]:
        for a, b in zip(outs[vs[0]], outs[ver]):
            assert abs(a - b) <= 2e-3 * max(abs(a), 1.0), \
                ('concat83', ver, outs[vs[0]], outs[ver])
    print(json.dumps({'block_bwd_concat83': {
        v: report[f'bwd_{v}_concat83'] for v in vs}, 'batch': B}),
        flush=True)


if __name__ == '__main__':
    main()
