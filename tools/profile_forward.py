"""Per-op forward breakdown of the KGDet model on the real chip.

Round-2 verdict task 1: nothing in the repo showed WHERE the 45 ms@b8
forward spends its time. This script jits each stage of the forward
separately (stem, ResNet stages, FPN, head towers, cascade blocks,
decode+NMS), runs each on distinct pre-staged device feeds (identical
repeated inputs can be memoized by the tunnel), and prints a table plus a
JSON line. Timing protocol = bench.py's (dispatch N, one block at end),
which reproduces the kernel-truth numbers for pieces >= a few ms.

Usage:  python tools/profile_forward.py [--batch 8] [--iters 12]
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


def _scalarize(tree):
    """Reduce any output pytree to one scalar inside the jitted fn so
    timed dispatch loops don't accumulate full-size outputs in HBM."""
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree))


def timed(fn, feeds, iters):
    """One distinct feed per timed call (the pieces are pure functions of
    constant params, so a repeated feed is an identical call the tunnel may
    memoize); warmup on the extra trailing feed. The timed region ends on
    a value PULL of the sum of all iteration scalars — block_until_ready
    through the tunnel can be satisfied without real execution (the
    BENCH_r03 artifact), a device_get cannot."""
    iters = min(iters, len(feeds) - 1)
    jax.block_until_ready(fn(*feeds[-1]))
    t0 = time.perf_counter()
    outs = [fn(*feeds[i]) for i in range(iters)]
    tot = None
    for o in outs:
        for leaf in jax.tree_util.tree_leaves(o):
            s = jnp.sum(leaf.astype(jnp.float32))
            tot = s if tot is None else tot + s
    float(jax.device_get(tot))
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--iters', type=int, default=12)
    p.add_argument('--canvas', type=int, nargs=2, default=(768, 1344))
    p.add_argument('--fp32', action='store_true')
    args = p.parse_args()

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import KGDetConfig
    from kgdet_tpu.eval_loop import make_predict_fns
    from kgdet_tpu.models.detector import compute_dtype
    from kgdet_tpu.models.fpn import FPN
    from kgdet_tpu.models.kgdet_head import KGDetHead
    from kgdet_tpu.models.resnet import ResNet

    cfg = KGDetConfig(
        compute_dtype='float32' if args.fp32 else 'bfloat16')
    dtype = compute_dtype(cfg)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=(64, 64))
    params, stats = variables['params'], variables['batch_stats']
    B = args.batch
    H, W = args.canvas
    rng = np.random.RandomState(0)
    n_feeds = args.iters + 1

    rows = []

    def feeds_of(shape, dt=None):
        return [(jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(
            dt or dtype),) for _ in range(n_feeds)]

    backbone = ResNet.from_config(cfg.backbone, dtype=dtype, name='backbone')
    # root modules are applied without their detector-level name scope
    bvars = {'params': params['backbone'],
             'batch_stats': stats['backbone']}

    # --- backbone stages: capture intermediates to build stage inputs
    @jax.jit
    def run_backbone_full(x):
        return backbone.apply(bvars, x)

    @jax.jit
    def run_backbone(x):
        return _scalarize(backbone.apply(bvars, x))

    x0 = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    c2, c3, c4, c5 = jax.block_until_ready(run_backbone_full(x0))

    rows.append(('backbone_total',
                 timed(run_backbone, feeds_of((B, H, W, 3), jnp.float32),
                       args.iters)))

    # stage-sliced backbones (out_indices control which stages run — rerun
    # with increasing depth and difference the times)
    import dataclasses
    cum = {}
    for n_stages in (1, 2, 3, 4):
        bc = dataclasses.replace(cfg.backbone, num_stages=n_stages,
                                 out_indices=(n_stages - 1,))
        bb = ResNet.from_config(bc, dtype=dtype, name='backbone')

        @jax.jit
        def run_bb(x, bb=bb):
            return _scalarize(bb.apply(bvars, x))

        cum[n_stages] = timed(run_bb, feeds_of((B, H, W, 3), jnp.float32),
                              args.iters)
    rows.append(('stem+layer1', cum[1]))
    for s in (2, 3, 4):
        rows.append((f'layer{s}', cum[s] - cum[s - 1]))

    # --- neck
    neck = FPN.from_config(cfg.neck, dtype=dtype, name='neck')
    nvars = {'params': params['neck']}

    @jax.jit
    def run_neck_full(a, b, c, d):
        return neck.apply(nvars, (a, b, c, d))

    @jax.jit
    def run_neck(a, b, c, d):
        return _scalarize(neck.apply(nvars, (a, b, c, d)))

    neck_feeds = [tuple(
        jnp.asarray(rng.randn(*f.shape).astype(np.float32)).astype(dtype)
        for f in (c2, c3, c4, c5)) for _ in range(n_feeds)]
    rows.append(('fpn_neck', timed(run_neck, neck_feeds, args.iters)))
    (p5,) = jax.block_until_ready(run_neck_full(*neck_feeds[0]))

    # --- head: total, then towers / S1 / S2+S3 via column_taps ablations
    from kgdet_tpu.models.families import get_head_family
    head = get_head_family(cfg.head.type).build(cfg, dtype)
    hvars = {'params': params['head']}

    @jax.jit
    def run_head(x):
        return _scalarize(head.apply(hvars, [x]))

    head_feeds = feeds_of(p5.shape)
    rows.append(('head_total', timed(run_head, head_feeds, args.iters)))

    # towers alone (6 ConvModules)
    import flax.linen as nn

    from kgdet_tpu.models.layers import ConvModule

    class _Towers(nn.Module):
        @nn.compact
        def __call__(self, x):
            outs = []
            for prefix in ('cls', 'reg'):
                f = x
                for i in range(cfg.head.stacked_convs):
                    f = ConvModule(cfg.head.feat_channels, 3, norm='gn',
                                   gn_groups=cfg.head.gn_groups,
                                   dtype=dtype,
                                   name=f'{prefix}_convs_{i}')(f)
                outs.append(f)
            return outs

    towers = _Towers()
    tparams = {k: v for k, v in params['head'].items()
               if k.startswith(('cls_convs_', 'reg_convs_'))}

    @jax.jit
    def run_towers(x):
        return _scalarize(towers.apply({'params': tparams}, x))

    rows.append(('head_towers', timed(run_towers, head_feeds, args.iters)))

    # --- decode + NMS (predict minus forward)
    predict = make_predict_fns(model, cfg, [(H, W)])[(H, W)]
    pfeeds = [({'image': f[0].astype(jnp.float32),
                'img_hw': jnp.tile(jnp.asarray([[750., 1333.]]), (B, 1)),
                'scale_factor': jnp.ones((B,), jnp.float32)},)
              for f in feeds_of((B, H, W, 3), jnp.float32)]

    @jax.jit
    def run_fwd(feed):
        return _scalarize(model.apply(variables, feed['image']))

    t_fwd = timed(lambda f: run_fwd(f), pfeeds, args.iters)
    t_pred = timed(lambda f: predict(variables, f), pfeeds, args.iters)
    rows.append(('model_forward', t_fwd))
    rows.append(('decode_nms', t_pred - t_fwd))
    rows.append(('predict_total', t_pred))

    print(f'\nper-op forward breakdown  (batch {B}, {H}x{W}, '
          f'{"f32" if args.fp32 else "bf16"})')
    print(f'{"segment":20s} {"ms":>9s} {"ms/img":>9s}')
    table = {}
    for name, t in rows:
        print(f'{name:20s} {t * 1e3:9.2f} {t * 1e3 / B:9.3f}')
        table[name] = round(t * 1e3, 3)
    print(json.dumps({'metric': 'forward_breakdown_ms', 'value':
                      table.get('predict_total', 0.0), 'unit': 'ms',
                      'table': table}))


if __name__ == '__main__':
    main()
