"""Profiler CLI: capture a jax.profiler trace of the inference or train step.

The reference has no tracer (SURVEY.md section 5); this is the TPU-native
observability tool — traces open in Perfetto / TensorBoard.

Usage:
  python -m kgdet_tpu.tools.profile configs/..._demo.py --mode infer \
      --trace-dir /tmp/kgdet_trace [--steps 5]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--mode', choices=['infer', 'train'], default='infer')
    p.add_argument('--trace-dir', default='/tmp/kgdet_trace')
    p.add_argument('--steps', type=int, default=5)
    p.add_argument('--batch-size', type=int, default=1)
    args = p.parse_args()

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import load_config
    from kgdet_tpu.eval_loop import make_predict_fns

    cfg = load_config(args.config)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    canvas = cfg.val_data.canvas_hw[0]
    B = args.batch_size
    rng = np.random.RandomState(0)

    if args.mode == 'infer':
        predict = make_predict_fns(model, cfg, [canvas])[tuple(canvas)]
        feed = {
            'image': jnp.asarray(
                rng.randn(B, canvas[0], canvas[1], 3).astype(np.float32)),
            'img_hw': jnp.tile(jnp.asarray(
                [[canvas[0] * 0.95, canvas[1] * 0.95]], jnp.float32), (B, 1)),
            'scale_factor': jnp.ones((B,), jnp.float32),
        }
        run = lambda: predict(variables, feed)
    else:
        from kgdet_tpu.parallel.train import (
            make_mesh, make_optimizer, make_train_step, replicate,
            shard_batch)
        params = variables['params']
        stats = variables.get('batch_stats', {})
        tx, _ = make_optimizer(cfg, params, steps_per_epoch=1000)
        opt_state = tx.init(params)
        step = jax.jit(make_train_step(model, cfg, canvas, tx))
        G, K = cfg.train_data.max_gts, cfg.head.num_keypts
        batch = {
            'image': rng.randn(B, canvas[0], canvas[1], 3).astype(np.float32),
            'valid_hw': np.full((B, 2), canvas[0], np.int32),
            'gt_bboxes': np.tile(np.asarray(
                [[10., 10., 200., 200.]], np.float32), (B, G, 1)),
            'gt_labels': np.ones((B, G), np.int32),
            'gt_kpts': rng.rand(B, G, K, 3).astype(np.float32) * 100,
            'gt_mask': np.ones((B, G), bool),
        }
        state = [params, opt_state]

        def run():
            state[0], state[1], logs = step(state[0], stats, state[1], batch)
            return logs

    # compile outside the trace
    jax.block_until_ready(run())
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            out = run()
        jax.block_until_ready(out)
    print(f'trace written to {args.trace_dir}')


if __name__ == '__main__':
    main()
