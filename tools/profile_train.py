"""Piecewise train-step timing on the real chip.

Full-step profiler traces explode on this host (CLAUDE.md), so the step is
timed as nested jitted pieces and costs are read off the deltas:

  fwd            : model.apply only
  fwd+loss       : loss_fn value (adds target assignment + losses)
  value_and_grad : adds the whole backward
  full step      : adds optimizer update + param apply (bench.py --train)

Each piece is compiled separately and timed over n_iters distinct
pre-staged device feeds (identical feeds can be memoized by the relay).
Prints one JSON line per piece; paste the table into docs/design.md.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np


def main(batch=8):
    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import KGDetConfig
    from kgdet_tpu.parallel.train import (batch_valid_flags,
                                          build_level_geometry,
                                          compute_loss, make_optimizer,
                                          make_train_step)

    cfg = KGDetConfig(compute_dtype='bfloat16')
    canvas = (768, 1344)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=(64, 64))
    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=1000)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    G, K = 16, cfg.head.num_keypts
    # one DISTINCT feed per timed iteration + 1 warmup feed: the pieces are
    # pure functions of constant (params, stats), so a repeated feed is an
    # identical call the tunnel may memoize (and blocking on a memoized
    # result does not wait for earlier in-flight real calls)
    n_iters = 10
    feeds = []
    for _ in range(n_iters + 1):
        boxes = np.zeros((batch, G, 4), np.float32)
        boxes[..., 2:] = rng.uniform(64, 400, (batch, G, 2))
        boxes[..., :2] = rng.uniform(0, 300, (batch, G, 2))
        boxes[..., 2:] += boxes[..., :2]
        kpts = rng.uniform(0, 700, (batch, G, K, 3)).astype(np.float32)
        kpts[..., 2] = 1
        feeds.append({
            'image': jnp.asarray(rng.randn(
                batch, canvas[0], canvas[1], 3).astype(np.float32)),
            'valid_hw': jnp.tile(jnp.asarray([[750, 1333]], jnp.int32),
                                 (batch, 1)),
            'gt_bboxes': jnp.asarray(boxes),
            'gt_labels': jnp.asarray(
                rng.randint(1, 14, (batch, G)).astype(np.int32)),
            'gt_kpts': jnp.asarray(kpts),
            'gt_mask': jnp.asarray(np.ones((batch, G), bool)),
        })
    jax.block_until_ready(feeds)

    grids = build_level_geometry(cfg, canvas)

    def loss_fn(p, s, batch_):
        outs = model.apply({'params': p, 'batch_stats': s}, batch_['image'])
        valids = batch_valid_flags(cfg, canvas, batch_['valid_hw'])
        return compute_loss(outs, grids, valids, batch_, cfg,
                            canvas_hw=canvas)

    step = jax.jit(make_train_step(model, cfg, canvas, tx))

    def fwd_piece(p, s, batch_):
        outs = model.apply({'params': p, 'batch_stats': s}, batch_['image'])
        return sum(jnp.sum(v.astype(jnp.float32))
                   for lvl in jax.tree.leaves(outs) for v in [lvl])

    def loss_piece(p, s, batch_):
        return loss_fn(p, s, batch_)[0]

    def grad_piece(p, s, batch_):
        # scalar return: loss + grad checksum, so the timed region can end
        # on ONE device_get that provably depends on the whole backward
        (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s, batch_)
        return l + sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(g))

    pieces = {
        'fwd': jax.jit(fwd_piece),
        'fwd_loss': jax.jit(loss_piece),
        'value_and_grad': jax.jit(grad_piece),
    }
    report = {}

    def timed_scalar(calls):
        """block_until_ready through the tunnel can be satisfied without
        real execution (the BENCH_r03 artifact), so the timed region ends
        on a value PULL of the sum of every iteration's scalar — it cannot
        resolve until all the real work exists on device."""
        t0 = time.perf_counter()
        outs = calls()
        tot = outs[0]
        for o in outs[1:]:
            tot = tot + o
        float(jax.device_get(tot))
        return (time.perf_counter() - t0) / len(outs) * 1e3

    for name, fn in pieces.items():
        # warmup must PULL (a faked block would leak the compile into the
        # timed region — a 64.4 s 'fwd' was measured exactly that way)
        float(jax.device_get(fn(params, stats, feeds[n_iters])))
        ms = timed_scalar(lambda fn=fn: [
            fn(params, stats, feeds[i]) for i in range(n_iters)])
        report[name] = round(ms, 2)
        print(json.dumps({'piece': name, 'ms': report[name],
                          'batch': batch}), flush=True)

    # full step (donation disabled so params survive the loop; params/
    # opt_state stay constant across iters, but the loss logs depend on the
    # distinct feeds so every call is unique)
    float(jax.device_get(
        step(params, stats, opt_state, feeds[n_iters])[2]['loss']))
    ms = timed_scalar(lambda: [
        step(params, stats, opt_state, feeds[i])[2]['loss']
        for i in range(n_iters)])
    report['full_step'] = round(ms, 2)
    print(json.dumps({'piece': 'full_step', 'ms': report['full_step'],
                      'batch': batch}), flush=True)
    print(json.dumps({'deltas_ms': {
        'forward': report['fwd'],
        'loss_targets': round(report['fwd_loss'] - report['fwd'], 2),
        'backward': round(report['value_and_grad'] - report['fwd_loss'], 2),
        'optimizer': round(report['full_step'] - report['value_and_grad'], 2),
    }, 'batch': batch}), flush=True)


if __name__ == '__main__':
    b = int(sys.argv[sys.argv.index('--batch') + 1]) \
        if '--batch' in sys.argv else 8
    main(batch=b)
