"""Mandate: can the DMA engine beat VPU vector loads for the tap gather?

The fused deform kernels are load-issue bound on the (pixel, tap) corner
gather from the VMEM-resident row-paired slab (docs/design.md round-4
notes: intra-kernel software pipelining measured ZERO because the
TensorCore is one in-order VLIW stream). The one engine that could
overlap fetches with the VPU lerp is the DMA engine
(pltpu.make_async_copy), so this tool isolates exactly that trade on
chip, at the cascade gather pattern (TP=128 pixels x K taps per grid
step, each fetching a (2, 2, st, LANE) corner block at a data-dependent
row):

  load: scratch[slot] = slab[ds(r0, 2)]      (vector loads, the shipped
        form of the walk, 8-pixel slot groups)
  dma : 8 async VMEM->VMEM copies in flight per group, batch-waited
        before the group is consumed (max DMA parallelism the slot
        rotation allows)

Both variants do identical consume work (one accumulate per 8-pixel
group) so the delta is pure fetch-engine cost. If 'dma' loses, the
per-descriptor issue cost (scalar-core cycles, the very resource the
walk saturates) exceeds the vector-load cost and DMA-driven gather is
dead at this granularity; record the number either way.

Usage: python tools/profile_dma_gather.py [--iters 6] [--k 49]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TP = 128
LANE = 128
SLOTS = 8


def _consume(scratch_ref, acc_ref):
    acc_ref[...] = acc_ref[...] + scratch_ref[...].astype(jnp.float32).sum(
        axis=0)


def _load_kernel(starts_ref, feat_ref, out_ref, scratch_ref, acc_ref, *, K):
    pt = pl.program_id(0)

    @pl.when(pt == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    def body(g, _):
        base = g * SLOTS
        for k in range(K):
            for s in range(SLOTS):
                r0 = starts_ref[0, base + s, k]
                scratch_ref[s] = feat_ref[pl.ds(r0, 2)]
            _consume(scratch_ref, acc_ref)
        return 0

    lax.fori_loop(0, TP // SLOTS, body, 0)
    out_ref[...] = acc_ref[...]


def _dma_kernel(starts_ref, feat_ref, out_ref, scratch_ref, acc_ref,
                sems, *, K):
    pt = pl.program_id(0)

    @pl.when(pt == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    def body(g, _):
        base = g * SLOTS
        for k in range(K):
            for s in range(SLOTS):
                r0 = starts_ref[0, base + s, k]
                pltpu.make_async_copy(
                    feat_ref.at[pl.ds(r0, 2)], scratch_ref.at[s],
                    sems.at[s]).start()
            for s in range(SLOTS):
                r0 = starts_ref[0, base + s, k]
                pltpu.make_async_copy(
                    feat_ref.at[pl.ds(r0, 2)], scratch_ref.at[s],
                    sems.at[s]).wait()
            _consume(scratch_ref, acc_ref)
        return 0

    lax.fori_loop(0, TP // SLOTS, body, 0)
    out_ref[...] = acc_ref[...]


def run(variant, starts, feat_p, HW, st, K, dtype):
    n_pt = starts.shape[1] // TP
    kern = functools.partial(
        _load_kernel if variant == 'load' else _dma_kernel, K=K)
    scratch = [pltpu.VMEM((SLOTS, 2, 2, st, LANE), dtype),
               pltpu.VMEM((2, 2, st, LANE), jnp.float32)]
    if variant == 'dma':
        scratch.append(pltpu.SemaphoreType.DMA((SLOTS,)))
    return pl.pallas_call(
        kern,
        grid=(n_pt,),
        in_specs=[
            pl.BlockSpec((1, TP, K), lambda t: (0, t, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((HW, 2, st, LANE), lambda t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((2, 2, st, LANE), jnp.float32),
        out_specs=pl.BlockSpec((2, 2, st, LANE),
                               lambda t: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )(starts, feat_p)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=6)
    p.add_argument('--k', type=int, default=49)
    args = p.parse_args()

    from trace_piece import device_time_ms

    from kgdet_tpu.ops.pallas_deform import pair_rows

    H, W, C = 24, 42, 512        # stride-32 concat shape
    HW, S = H * W, C // LANE
    K = args.k
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    n = args.iters + 1
    P_pad = -(-HW // TP) * TP
    feeds = []
    for _ in range(n):
        feat = jnp.asarray(rng.randn(1, HW, S, LANE).astype(np.float32)) \
            .astype(dtype)
        rows = rng.randint(0, (H - 1) * W, (1, P_pad, K)).astype(np.int32)
        feeds.append((jnp.asarray(rows), pair_rows(feat, W)[0]))
    results = {}
    sums = {}
    for variant in ('load', 'dma'):
        fn = jax.jit(functools.partial(
            run, variant, HW=HW, st=S, K=K, dtype=dtype))
        out = fn(*feeds[0])
        jax.block_until_ready(out)
        sums[variant] = float(jnp.sum(jnp.abs(out)))
        ms = device_time_ms(fn, feeds)
        results[f'gather_{variant}_k{K}'] = round(ms, 3)
        print(f'{variant} k{K}: {ms:.3f} ms', flush=True)
    assert abs(sums['load'] - sums['dma']) \
        <= 1e-3 * max(abs(sums['load']), 1.0), sums
    print(json.dumps(results))


if __name__ == '__main__':
    main()
