"""Robustness benchmark: mAP under image corruptions.

Parity surface: reference tools/test_robustness.py (evaluate across a
corruption x severity grid; report per-corruption AP and mean corruption AP).

Usage:
  python -m kgdet_tpu.tools.test_robustness configs/..._demo.py \
      [--checkpoint CKPT | --load-pth PTH] \
      [--corruptions gaussian_noise motion_blur] [--severities 1 3 5]
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--load-pth', default=None)
    p.add_argument('--corruptions', nargs='+', default=None,
                   help='default: all')
    p.add_argument('--severities', type=int, nargs='+', default=[1, 3, 5])
    p.add_argument('--eval', nargs='+', default=['bbox'])
    p.add_argument('--out', default=None, help='write results json')
    args = p.parse_args()

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import load_config
    from kgdet_tpu.data.corruptions import CORRUPTIONS, corrupt
    from kgdet_tpu.data.dataset import DeepFashion2Dataset
    from kgdet_tpu.data.loader import DataLoader
    from kgdet_tpu.eval_loop import evaluate_results, run_inference

    cfg = load_config(args.config)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.load_pth:
        from kgdet_tpu.utils.torch_convert import (
            convert_pth, merge_into_variables)
        params, stats, _ = convert_pth(args.load_pth)
        variables = merge_into_variables(variables, params, stats)
    elif args.checkpoint:
        from kgdet_tpu.utils.checkpoint import load_params
        restored = load_params(args.checkpoint)
        variables = {'params': restored.get('params', restored),
                     'batch_stats': restored.get('batch_stats', {})}

    corruptions = args.corruptions or sorted(CORRUPTIONS)
    results_table = {}

    class CorruptedDataset(DeepFashion2Dataset):
        corruption = None
        severity = 1

        def load_image(self, record):
            img = super().load_image(record)
            if self.corruption:
                img = corrupt(img, self.corruption, self.severity)
            return img

    dataset = CorruptedDataset(cfg.val_data, train=False)
    batch = max(cfg.val_data.batch_size, 1)

    def eval_once(tag):
        loader = DataLoader(dataset, batch, train=False, num_workers=2)
        results = run_inference(model, variables, cfg, loader, verbose=False)
        stats, _ = evaluate_results(results, dataset, verbose=False,
                                    iou_types=tuple(args.eval))
        aps = {t: s['AP'] for t, s in stats.items()}
        print(f'{tag}: ' + ' '.join(f'{t} AP {v:.4f}'
                                    for t, v in aps.items()), flush=True)
        return aps

    dataset.corruption = None
    results_table['clean'] = eval_once('clean')
    for name in corruptions:
        for sev in args.severities:
            dataset.corruption = name
            dataset.severity = sev
            results_table[f'{name}/s{sev}'] = eval_once(f'{name} s{sev}')

    for t in args.eval:
        vals = [v[t] for k, v in results_table.items() if k != 'clean']
        if vals:
            print(f'mean corruption {t} AP: {np.mean(vals):.4f} '
                  f'(clean {results_table["clean"][t]:.4f})')
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results_table, f, indent=1)
        print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
