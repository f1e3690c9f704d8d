"""Per-op device-time breakdown INSIDE one deform cascade block.

profile_hotspots.py times the whole KpRepBlock at ~9.7 ms device-busy of
which the three tap walks account for ~5.0 — this tool answers "what is
the other half?" by aggregating the xplane device events of the jitted
block by op name (fusion/custom-call labels), so layout copies or
low-MFU convs show up by name.

Usage (TPU): python tools/profile_block_ops.py [--iters 4 --topk 25]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=4)
    p.add_argument('--topk', type=int, default=25)
    args = p.parse_args()

    from trace_piece import op_table_ms

    from kgdet_tpu.models.kgdet_head import COLUMN_TAPS, KpRepBlock

    B, h, w, C = 8, 24, 42, 256
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    blkd = KpRepBlock(deform=True, cls_out_channels=13, dtype=dtype)
    f0 = jnp.zeros((1, h, w, C), dtype)
    r0 = jnp.zeros((1, h, w, 2 * sum(COLUMN_TAPS)), dtype)
    v_d = blkd.init(jax.random.PRNGKey(0), f0, f0, r0)

    feeds = [(jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)
                          ).astype(dtype),
              jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)
                          ).astype(dtype),
              jnp.asarray((rng.randn(B, h, w, 2 * sum(COLUMN_TAPS)) * 2)
                          .astype(np.float32)).astype(dtype))
             for _ in range(args.iters + 1)]

    @jax.jit
    def deform_block(cf, pf, rep):
        out = blkd.apply(v_d, cf, pf, rep)
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree.leaves(out))

    jax.block_until_ready(deform_block(*feeds[-1]))
    trace_dir = tempfile.mkdtemp(prefix='kgdet_blockops_')
    with jax.profiler.trace(trace_dir):
        outs = [deform_block(*f) for f in feeds[:-1]]
        jax.block_until_ready(outs)

    n_calls = args.iters
    rows = op_table_ms(trace_dir, top=args.topk)
    total = sum(ms for _, ms in op_table_ms(trace_dir, top=10 ** 6))
    print(f'total device op time: {total / n_calls:.3f} ms/call '
          f'over {n_calls} calls')
    print(f'{"op (xplane event)":70s} {"ms/call":>8s}')
    for name, ms in rows:
        print(f'{name[:70]:70s} {ms / n_calls:8.3f}')


if __name__ == '__main__':
    main()
