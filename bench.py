"""Benchmark: KGDet inference throughput (images/sec/chip) on real hardware.

Protocol mirrors the reference's tools/benchmark.py (batch-1-equivalent fps,
warmup then timed average, device-synchronized) but runs the whole pipeline —
forward + decode + NMS — on device at the canonical 750x1333-padded-to-/32
resolution. vs_baseline is against the mmdet-v1.x zoo proxy of 13.6 fps on a
V100 (reference MODEL_ZOO.md:59-66; the KGDet repo publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 13.6  # mmdetection v1.x R-50-FPN inference fps on 1x V100


def main():
    from kgdet_tpu.api import build_model, init_variables, make_predict_fn
    from kgdet_tpu.config import KGDetConfig

    cfg = KGDetConfig(compute_dtype='bfloat16')
    model = build_model(cfg)
    canvas = (768, 1344)  # (1333, 800) keep-ratio resize padded to /32
    batch = 8

    variables = init_variables(model, cfg, canvas_hw=(64, 64))
    predict = make_predict_fn(model, cfg, canvas)

    rng = np.random.RandomState(0)
    # every iteration gets a DISTINCT pre-staged device feed: repeated
    # identical inputs can be memoized by remote-execution layers, and
    # per-iteration host transfers would measure the host link instead of
    # the chip
    n_iters = 20
    feeds = []
    for _ in range(n_iters):
        feeds.append({
            'image': jnp.asarray(rng.randn(
                batch, canvas[0], canvas[1], 3).astype(np.float32)),
            'img_hw': jnp.tile(
                jnp.array([[750, 1333]], jnp.float32), (batch, 1)),
            'scale_factor': jnp.ones((batch,), jnp.float32),
        })
    jax.block_until_ready(feeds)

    # warmup / compile
    out = predict(variables, feeds[0])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    outs = [predict(variables, f) for f in feeds]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    fps = n_iters * batch / dt
    print(json.dumps({
        'metric': 'kgdet_inference_throughput_768x1344',
        'value': round(fps, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(fps / BASELINE_FPS, 2),
    }))


if __name__ == '__main__':
    main()
