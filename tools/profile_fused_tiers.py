"""A/B the round-5 fused-kernel tiers at the serial-head big-map shapes.

The serial/parallel RepPoints recipes run the refine stage's fused
gather+contract at stride 8 (HW=16128) and stride 16 (HW=4032). In round 4
the stride-8 calls ran UNPAIRED (the 2x row-paired slab exceeds the 12M
fused budget), so neither row pairing nor the vector-weight walk applied
to 76% of the pixels. Round 5 adds two tiers: 'hivmem' (full-paired under
a raised vmem_limit_bytes — v5e has 128M physical VMEM vs the ~16M default
scoped cap) and 'tiled' (per-lane-slice paired slabs, f32 partial sums).

Times each tier per (level, call) with xplane device-busy ms and checks
cross-tier output checksums. One JSON line at the end.

Usage: python tools/profile_fused_tiers.py [--iters 6] [--batch 4]
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=6)
    p.add_argument('--batch', type=int, default=4)
    p.add_argument('--tiers', default='unpaired,tiled,hivmem')
    args = p.parse_args()

    from trace_piece import device_time_ms

    import kgdet_tpu.ops.pallas_deform as pd

    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    n = args.iters + 1
    results = {}

    # (level, H, W, F): serial refine issues one cls call (F=256) and one
    # pts call (F=512, kpt|rep weight concat) per level; stride 32+ fits
    # the classic paired budget already, so only s8/s16 are A/B'd
    cases = [('s8_cls', 96, 168, 256), ('s8_pts', 96, 168, 512),
             ('s16_pts', 48, 84, 512)]
    K, C = 9, 256
    for name, H, W, F in cases:
        P = H * W
        feeds = [(
            jnp.asarray(rng.randn(args.batch, H, W, C).astype(np.float32))
            .astype(dtype),
            jnp.asarray(rng.uniform(
                0, [H - 1, W - 1],
                (args.batch, P, K, 2)).astype(np.float32)),
            jnp.asarray((rng.randn(K, C, F) * 0.05).astype(np.float32))
            .astype(dtype),
        ) for _ in range(n)]
        sums = {}
        for tier in args.tiers.split(','):
            os.environ['KGDET_FUSED_TIER'] = tier
            # reload so pjit's global trace cache (keyed on the function
            # object) cannot hand back the previous tier's program
            importlib.reload(pd)
            fn = jax.jit(pd._fused_impl)
            out = fn(*feeds[0])
            jax.block_until_ready(out)
            sums[tier] = float(jnp.sum(jnp.abs(out.astype(jnp.float32))))
            ms = device_time_ms(fn, feeds)
            results[f'{name}_{tier}'] = round(ms, 3)
            print(f'{name} {tier}: {ms:.3f} ms', flush=True)
        os.environ.pop('KGDET_FUSED_TIER', None)
        ts = list(sums)
        for t in ts[1:]:
            assert abs(sums[ts[0]] - sums[t]) \
                <= 2e-3 * max(abs(sums[ts[0]]), 1.0), (name, sums)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
