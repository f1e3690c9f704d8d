"""Training CLI (parity surface: reference mmdetection/tools/train.py).

Usage:
  python -m kgdet_tpu.tools.train configs/kgdet_moment_r50_fpn_1x_demo.py \
      [--work-dir DIR] [--resume] [--load-from ORBAX_PATH | --load-pth PTH] \
      [--validate] [--seed N] [--max-epochs N]

Multi-host: run the same command on every host after setting
JAX_COORDINATOR_ADDRESS etc.; pass --distributed to call
jax.distributed.initialize() (replaces the reference's
torch.distributed.launch + dist_train.sh).
"""
from __future__ import annotations

import argparse

import jax


def parse_args():
    p = argparse.ArgumentParser(description='Train KGDet (TPU-native)')
    p.add_argument('config', help='python config file defining `config`')
    p.add_argument('--work-dir', default=None)
    p.add_argument('--resume', action='store_true',
                   help='resume from the latest checkpoint in work_dir')
    p.add_argument('--load-from', default=None,
                   help='Orbax variables checkpoint to initialize from')
    p.add_argument('--load-pth', default=None,
                   help='PyTorch .pth checkpoint to convert and load')
    p.add_argument('--validate', action='store_true')
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--max-epochs', type=int, default=None)
    p.add_argument('--autoscale-lr', action='store_true',
                   help='scale lr by global_batch/16 (the reference scales '
                        'by GPUs/8 at 2 imgs/GPU; reference train.py:67)')
    p.add_argument('--log-interval', type=int, default=50)
    p.add_argument('--distributed', action='store_true',
                   help='call jax.distributed.initialize() (multi-host)')
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        jax.distributed.initialize()

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import load_config
    from kgdet_tpu.runner import Runner
    from kgdet_tpu.utils.checkpoint import load_params

    cfg = load_config(args.config)
    if args.seed is not None:
        cfg = cfg.replace(seed=args.seed)
    if args.work_dir is not None:
        cfg = cfg.replace(work_dir=args.work_dir)
    if args.autoscale_lr:
        import dataclasses
        scale = cfg.train_data.batch_size / 16
        cfg = cfg.replace(optim=dataclasses.replace(
            cfg.optim, lr=cfg.optim.lr * scale))
        if jax.process_index() == 0:
            print(f'[train] autoscaled lr x{scale:g} -> {cfg.optim.lr:g}')

    init_vars = None
    if args.load_pth:
        from kgdet_tpu.utils.torch_convert import (
            convert_pth, merge_into_variables)
        model = build_model(cfg)
        variables = init_variables(model, cfg)
        params, stats, skipped = convert_pth(args.load_pth)
        if skipped and jax.process_index() == 0:
            print(f'[convert] skipped {len(skipped)} keys: {skipped[:8]}...')
        init_vars = merge_into_variables(variables, params, stats)
    elif args.load_from:
        model = build_model(cfg)
        template = init_variables(model, cfg)
        init_vars = load_params(args.load_from, template)

    runner = Runner(cfg, work_dir=cfg.work_dir,
                    log_interval=args.log_interval)
    runner.setup(init_from_variables=init_vars, resume=args.resume)
    if jax.process_index() == 0:
        print(f'[train] {len(runner.train_dataset)} images, '
              f'{runner.steps_per_epoch} steps/epoch, '
              f'{jax.device_count()} device(s)', flush=True)
    runner.run(validate=args.validate, max_epochs=args.max_epochs)


if __name__ == '__main__':
    main()
