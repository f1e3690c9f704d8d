"""Fine-grained timing of the two forward hotspots: stem+layer1 and the
cascade deform blocks.

profile_forward.py showed (batch 8, 768x1344, bf16) backbone 22.3 ms of
which stem+layer1 is 15.5, and head_total 25.5 of which towers are only
3.7 — this script splits those two segments further:

  stem_conv        s2d-packed 7x7/2 conv alone
  stem_full        conv + FrozenBN + relu + maxpool
  layer1           (stem+layer1) - stem_full is the layer1 residue
  s1_block         KpRepBlock deform=False (plain convs + Dense heads)
  deform_block     KpRepBlock deform=True, fused Pallas path (inference)
  deform_block_xla same with KGDET_DISABLE_PALLAS=1 (XLA gather fallback)
  fused_call_k49   one deform_conv_fused at the 49-tap column shape
  deform_block_vjp value_and_grad through one deform block (training path)

Usage: python tools/profile_hotspots.py [--iters 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, feeds, iters):
    """Device-busy ms per call from an xplane trace (kernel truth; wall
    clock through the tunnel under-reports sub-ms pieces)."""
    from trace_piece import device_time_ms
    iters = min(iters, len(feeds) - 1)
    return device_time_ms(fn, feeds[:iters + 1]) / 1e3   # -> seconds


def _scalarize(tree):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=8)
    p.add_argument('--batch', type=int, default=8)
    args = p.parse_args()

    import flax.linen as nn

    from kgdet_tpu.models.kgdet_head import COLUMN_TAPS, KpRepBlock
    from kgdet_tpu.models.layers import FrozenBatchNorm, max_pool_3x3_s2
    from kgdet_tpu.models.resnet import ResNet, s2d_stem_conv

    B = args.batch
    H, W = 768, 1344
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    n = args.iters + 1
    rows = []

    def feeds_of(shape, dt=dtype):
        return [(jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dt),)
                for _ in range(n)]

    # ---- stem pieces
    kernel = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32))
    bn = FrozenBatchNorm(dtype=dtype)
    bnv = bn.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1, 64), dtype))

    @jax.jit
    def stem_conv(x):
        return _scalarize(s2d_stem_conv(x.astype(dtype), kernel))

    @jax.jit
    def stem_full(x):
        y = s2d_stem_conv(x.astype(dtype), kernel)
        y = bn.apply(bnv, y)
        return _scalarize(max_pool_3x3_s2(nn.relu(y)))

    img_feeds = feeds_of((B, H, W, 3), jnp.float32)
    rows.append(('stem_conv', timed(stem_conv, img_feeds, args.iters)))
    rows.append(('stem_full', timed(stem_full, img_feeds, args.iters)))

    # stem+layer1 (ResNet sliced to one stage) for the layer1 residue;
    # frozen_stages=1 matches the production config, so this takes the
    # transposed stem->pool->layer1 pipeline (ops/pallas_stem.py) on TPU
    bb1 = ResNet(depth=50, num_stages=1, out_indices=(0,), dtype=dtype,
                 frozen_stages=1, name='backbone')
    v1 = bb1.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    @jax.jit
    def run_bb1(x):
        return _scalarize(bb1.apply(v1, x))

    t_bb1 = timed(run_bb1, img_feeds, args.iters)
    rows.append(('stem+layer1', t_bb1))
    del img_feeds

    # ---- head pieces (stride-32 level)
    h, w, C = 24, 42, 256
    blk1 = KpRepBlock(deform=False, cls_out_channels=13, dtype=dtype)
    blkd = KpRepBlock(deform=True, cls_out_channels=13, dtype=dtype)
    f0 = jnp.zeros((1, h, w, C), dtype)
    r0 = jnp.zeros((1, h, w, 2 * sum(COLUMN_TAPS)), dtype)
    v_s1 = blk1.init(jax.random.PRNGKey(0), f0, f0)
    v_d = blkd.init(jax.random.PRNGKey(0), f0, f0, r0)

    def head_feeds():
        return [(jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)
                             ).astype(dtype),
                 jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)
                             ).astype(dtype),
                 jnp.asarray((rng.randn(B, h, w, 2 * sum(COLUMN_TAPS)) * 2)
                             .astype(np.float32)).astype(dtype))
                for _ in range(n)]

    hf = head_feeds()

    @jax.jit
    def s1_block(cf, pf, rep):
        return _scalarize(blk1.apply(v_s1, cf, pf))

    rows.append(('s1_block', timed(s1_block, hf, args.iters)))

    @jax.jit
    def deform_block(cf, pf, rep):
        return _scalarize(blkd.apply(v_d, cf, pf, rep))

    rows.append(('deform_block', timed(deform_block, hf, args.iters)))

    os.environ['KGDET_DISABLE_PALLAS'] = '1'

    @jax.jit
    def deform_block_xla(cf, pf, rep):
        return _scalarize(blkd.apply(v_d, cf, pf, rep))

    rows.append(('deform_block_xla',
                 timed(deform_block_xla, hf, args.iters)))
    del os.environ['KGDET_DISABLE_PALLAS']

    # split-kernel path (shared 83-tap gather + MXU einsums, the training
    # forward) for the fused-vs-split inference decision
    os.environ['KGDET_DISABLE_FUSED'] = '1'

    @jax.jit
    def deform_block_split(cf, pf, rep):
        return _scalarize(blkd.apply(v_d, cf, pf, rep))

    rows.append(('deform_block_split',
                 timed(deform_block_split, hf, args.iters)))
    del os.environ['KGDET_DISABLE_FUSED']

    # one fused call at the 49-tap column shape
    from kgdet_tpu.ops.pallas_deform import deform_conv_fused
    wt = jnp.asarray(rng.randn(49, C, C).astype(np.float32)).astype(dtype)
    pos_feeds = [(f[0],
                  jnp.asarray(rng.uniform(
                      0, [h - 1, w - 1],
                      (B, h * w, 49, 2)).astype(np.float32)))
                 for f in hf]

    @jax.jit
    def fused_call(f, pos):
        return _scalarize(deform_conv_fused(f, pos, wt))

    rows.append(('fused_call_k49', timed(fused_call, pos_feeds, args.iters)))

    # training path: value_and_grad through one deform block
    @jax.jit
    def deform_block_vjp(cf, pf, rep):
        def loss(params):
            return _scalarize(blkd.apply({'params': params}, cf, pf, rep))
        l, g = jax.value_and_grad(loss)(v_d['params'])
        return l + _scalarize(g)

    rows.append(('deform_block_vjp',
                 timed(deform_block_vjp, hf, args.iters)))

    print(f'\nhotspot breakdown  (batch {B}, bf16)')
    table = {}
    for name, t in rows:
        print(f'{name:20s} {t * 1e3:9.2f} ms')
        table[name] = round(t * 1e3, 3)
    print(json.dumps({'metric': 'hotspot_breakdown_ms', 'table': table}))


if __name__ == '__main__':
    main()
