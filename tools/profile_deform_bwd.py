"""Microbenchmark: deformable-sampling fwd/bwd kernel cost at head shapes.

Times the Pallas sampling forward and the fused backward (_deform_bwd_pallas)
standalone at the KGDet cascade hot shape, one call per (column, branch) the
way the training path issues them, so the deform share of the train-step
backward can be read directly. Distinct feeds per iteration (the tunnel may
memoize repeated identical calls).

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
        for ver in ('v1', 'v2'):
            os.environ['KGDET_DEFORM_BWD'] = ver
            bwd = jax.jit(lambda f, pos, g: _deform_bwd_pallas(f, pos, g))
            t_b = timed(bwd, feat_feeds, args.iters)
            report[f'bwd_{ver}_k{K}'] = round(t_b * 1e3, 3)
        os.environ.pop('KGDET_DEFORM_BWD', None)
        report[f'bwd_k{K}'] = report[f'bwd_v2_k{K}']
        print(json.dumps({'K': K, 'fwd_ms': report[f'fwd_k{K}'],
                          'bwd_v1_ms': report[f'bwd_v1_k{K}'],
                          'bwd_v2_ms': report[f'bwd_v2_k{K}']}), flush=True)

    # per-block totals as the training path issues them (2 branches), and
    # the whole cascade (2 deform blocks)
    blk_f = sum(report[f'fwd_k{k}'] for k in (9, 25, 49)) * 2
    blk_b = sum(report[f'bwd_k{k}'] for k in (9, 25, 49)) * 2
    print(json.dumps({'cascade_deform_fwd_ms': round(blk_f * 2, 2),
                      'cascade_deform_bwd_ms': round(blk_b * 2, 2),
                      'batch': B}), flush=True)


if __name__ == '__main__':
    main()
