"""Per-level breakdown of the serial-RepPoints inference recipe.

The serial bench (bench.py --serial) reports one number for the whole
5-level (stride 8..128) pipeline; this tool splits it on the real chip:

  backbone      : ResNet-50 (4 outputs)
  neck          : FPN (5 outputs)
  head_full     : SerialKpHead over all 5 levels
  head_s<N>     : a single-level SerialKpHead instance at stride N reusing
                  the SAME (level-shared) params — per-level head cost
  predict_full  : the whole jitted predict (adds decode + NMS)

Each piece is jitted separately and timed on distinct pre-staged feeds
(identical repeated calls can be memoized by the tunnel); device-busy ms
comes from xplane traces via trace_piece.

Usage: python tools/profile_serial.py [--iters 6] [--batch 4]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

import jax
import jax.numpy as jnp
import numpy as np


def scalarize(tree):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=6)
    p.add_argument('--batch', type=int, default=4)
    args = p.parse_args()

    from trace_piece import device_time_ms

    from kgdet_tpu.api import build_model, init_variables, make_predict_fn
    from kgdet_tpu.config import load_config
    from kgdet_tpu.models.detector import build_backbone, build_neck
    from kgdet_tpu.models.families import get_head_family

    cfg = load_config(
        'configs/reppoints_moment_serial_r50_fpn_1x_deepfashion2.py')
    cfg = cfg.replace(compute_dtype='bfloat16',
                      test=dataclasses.replace(cfg.test, score_thr=0.0))
    model = build_model(cfg)
    canvas = (768, 1344)
    B = args.batch
    variables = init_variables(model, cfg, canvas_hw=(64, 64))
    params = variables['params']
    stats = variables.get('batch_stats', {})
    predict = make_predict_fn(model, cfg, canvas)
    dtype = jnp.bfloat16

    rng = np.random.RandomState(0)
    n = args.iters + 1
    feeds = [{
        'image': jnp.asarray(rng.randn(
            B, canvas[0], canvas[1], 3).astype(np.float32)),
        'img_hw': jnp.tile(jnp.array([[750, 1333]], jnp.float32), (B, 1)),
        'scale_factor': jnp.ones((B,), jnp.float32),
    } for _ in range(n)]
    jax.block_until_ready(feeds)

    results = {}

    fn = lambda f: scalarize(predict(variables, f))  # noqa: E731
    results['predict_full'] = round(device_time_ms(
        jax.jit(fn), [(f,) for f in feeds]), 3)
    print(f"predict_full: {results['predict_full']} ms", flush=True)

    backbone = build_backbone(cfg, dtype)
    neck = build_neck(cfg, dtype)
    head = get_head_family(cfg.head.type).build(cfg, dtype)
    bb_vars = {'params': params['backbone']}
    if 'backbone' in stats:
        bb_vars['batch_stats'] = stats['backbone']

    ifeeds = [(f['image'].astype(dtype),) for f in feeds]
    bb_out = backbone.apply(bb_vars, ifeeds[0][0])
    results['backbone'] = round(device_time_ms(
        jax.jit(lambda x: scalarize(backbone.apply(bb_vars, x))),
        ifeeds), 3)
    print(f"backbone: {results['backbone']} ms", flush=True)

    bshapes = [tuple(t.shape) for t in bb_out]
    bfeeds = [tuple(
        jnp.asarray(rng.randn(*s).astype(np.float32)).astype(t.dtype)
        for s, t in zip(bshapes, bb_out)) for _ in range(n)]
    jax.block_until_ready(bfeeds)
    neck_out = neck.apply({'params': params['neck']}, list(bfeeds[0]))
    results['neck'] = round(device_time_ms(
        jax.jit(lambda *xs: scalarize(
            neck.apply({'params': params['neck']}, list(xs)))),
        bfeeds), 3)
    print(f"neck: {results['neck']} ms", flush=True)

    shapes = [tuple(t.shape) for t in neck_out]
    hfeeds = [tuple(
        jnp.asarray(rng.randn(*s).astype(np.float32)).astype(t.dtype)
        for s, t in zip(shapes, neck_out)) for _ in range(n)]
    jax.block_until_ready(hfeeds)
    head_vars = {'params': params['head']}
    results['head_full'] = round(device_time_ms(
        jax.jit(lambda *xs: scalarize(head.apply(head_vars, list(xs)))),
        hfeeds), 3)
    print(f"head_full: {results['head_full']} ms", flush=True)

    for li, stride in enumerate(cfg.head.point_strides):
        cfg1 = cfg.replace(head=dataclasses.replace(
            cfg.head, point_strides=(stride,)))
        sub = get_head_family(cfg1.head.type).build(cfg1, dtype)
        lfeeds = [(hf[li],) for hf in hfeeds]
        try:
            results[f'head_s{stride}'] = round(device_time_ms(
                jax.jit(lambda x, sub=sub: scalarize(
                    sub.apply(head_vars, [x]))), lfeeds), 3)
            print(f"head_s{stride}: {results[f'head_s{stride}']} ms",
                  flush=True)
        except Exception as e:   # params not level-shared -> record why
            print(f'head_s{stride} skipped: {type(e).__name__}: {e}',
                  flush=True)
            break

    print(json.dumps({**results, 'batch': B}))


if __name__ == '__main__':
    main()
