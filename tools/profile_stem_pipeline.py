"""On-chip A/B of the transposed stem->maxpool->layer1 pipeline.

Compares device-busy time (xplane truth) and outputs of:
  old     ResNet frozen prefix via s2d_stem_conv + XLA bn/relu/pool +
          FusedBottleneck x3 (KGDET_DISABLE_STEM_PIPELINE=1)
  pipe    the same prefix through ops/pallas_stem.stem_layer1_pipeline
plus the isolated stem_pool_transposed and one bottleneck_transposed call
so a regression can be localized.

Usage (TPU): python tools/profile_stem_pipeline.py [--iters 6 --batch 8]
"""
from __future__ import annotations

import argparse
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
    p.add_argument('--batch', type=int, default=8)
    args = p.parse_args()

    from trace_piece import device_time_ms

    from kgdet_tpu.models.resnet import ResNet
    from kgdet_tpu.ops import pallas_stem as ps

    B, H, W = args.batch, 768, 1344
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    n = args.iters + 1
    img_feeds = [(jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),)
                 for _ in range(n)]
    results = {}

    bb = ResNet(depth=50, num_stages=1, out_indices=(0,), frozen_stages=1,
                dtype=dtype, name='backbone')
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rs = np.random.RandomState(1)
    variables = jax.tree.map(
        lambda v: jnp.asarray(rs.rand(*v.shape).astype(np.float32) * .2
                              + .5), variables)

    for tag, env in (('old', '1'), ('pipe', '')):
        os.environ['KGDET_DISABLE_STEM_PIPELINE'] = env
        assert ps.use_stem_pipeline(B, H, W, 2) == (tag == 'pipe'), tag
        fn = jax.jit(lambda x: jnp.sum(
            bb.apply(variables, x)[0].astype(jnp.float32)))
        results[f'{tag}_ms'] = round(device_time_ms(fn, img_feeds), 3)
        out = jax.jit(lambda x: bb.apply(variables, x)[0])(img_feeds[0][0])
        results[f'{tag}_out'] = np.asarray(out, np.float64)

    a, b = results.pop('old_out'), results.pop('pipe_out')
    results['rel_err'] = float(np.max(np.abs(a - b) / (np.abs(b) + 1.0)))

    # isolated pieces
    sw = jnp.asarray((rng.randn(7, 7, 3, 64) * .2).astype(np.float32))
    sb = jnp.asarray((rng.randn(64) * .1).astype(np.float32))
    stem_fn = jax.jit(lambda x: jnp.sum(
        ps.stem_pool_transposed(x.astype(dtype), sw, sb)
        .astype(jnp.float32)))
    results['stem_pool_transposed_ms'] = round(
        device_time_ms(stem_fn, img_feeds), 3)

    blk = {
        'w1': jnp.asarray((rng.randn(64, 256) * .2).astype(np.float32)),
        'b1': jnp.asarray((rng.randn(64) * .1).astype(np.float32)),
        'w2': jnp.asarray((rng.randn(9, 64, 64) * .1).astype(np.float32)),
        'b2': jnp.asarray((rng.randn(64) * .1).astype(np.float32)),
        'w3': jnp.asarray((rng.randn(256, 64) * .2).astype(np.float32)),
        'b3': jnp.asarray((rng.randn(256) * .1).astype(np.float32)),
    }
    yfeeds = [(jnp.asarray(rng.randn(B, H // 4, 256, W // 4)
                           .astype(np.float32)).astype(dtype),)
              for _ in range(n)]
    blk_fn = jax.jit(lambda y: jnp.sum(
        ps.bottleneck_transposed(y, **blk).astype(jnp.float32)))
    results['bottleneck_transposed_ms'] = round(
        device_time_ms(blk_fn, yfeeds), 3)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
