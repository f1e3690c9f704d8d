"""Model FLOPs/memory report via XLA cost analysis.

Parity surface: reference tools/get_flops.py (module-hook FLOPs counter at
1280x800). Here the count comes from the compiled executable's own cost
analysis, so it reflects what actually runs after fusion.

Usage:
  python -m kgdet_tpu.tools.get_flops configs/..._demo.py [--shape 1280 800]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs=2, default=(1280, 800),
                   help='input H W (padded to the stride divisor)')
    args = p.parse_args()

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import load_config

    cfg = load_config(args.config)
    model = build_model(cfg)
    variables = init_variables(model, cfg)

    div = cfg.train_data.size_divisor
    H = -(-args.shape[0] // div) * div
    W = -(-args.shape[1] // div) * div
    x = jnp.zeros((1, H, W, 3), jnp.float32)

    lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(variables, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    n_params = sum(p.size for p in jax.tree.leaves(variables['params']))

    flops = cost.get('flops', float('nan'))
    bytes_accessed = cost.get('bytes accessed', float('nan'))
    print(f'Input shape: (1, {H}, {W}, 3)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'FLOPs (compiled, fused): {flops / 1e9:.2f} GFLOPs')
    print(f'HBM bytes accessed: {bytes_accessed / 1e9:.3f} GB')


if __name__ == '__main__':
    main()
