"""Inference + evaluation CLI (parity surface: reference tools/test.py).

Usage:
  python -m kgdet_tpu.tools.test configs/kgdet_moment_r50_fpn_1x_demo.py \
      --checkpoint work_dirs/.../checkpoints/1000 \
      [--load-pth KGDet_epoch-12.pth] \
      [--json-out results] [--eval bbox keypoints] [--batch-size N]

Emits {json_out}.bbox.json / {json_out}.keypoints.json in the reference's
results2json format, then scores them with the DeepFashion2 COCO evaluator.
"""
from __future__ import annotations

import argparse

import jax


def parse_args():
    p = argparse.ArgumentParser(description='Test KGDet (TPU-native)')
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None,
                   help='Orbax train-state or variables checkpoint')
    p.add_argument('--load-pth', default=None,
                   help='PyTorch .pth checkpoint to convert and evaluate')
    p.add_argument('--json-out', default=None)
    p.add_argument('--eval', nargs='*', default=['bbox', 'keypoints'],
                   choices=['bbox', 'keypoints', 'segm', 'proposal_fast'])
    p.add_argument('--proposal-nums', type=int, nargs='*',
                   default=[100, 300, 1000],
                   help='AR@N cuts for proposal_fast (RPN) evaluation')
    p.add_argument('--batch-size', type=int, default=None)
    p.add_argument('--aug', action='store_true',
                   help='multi-scale/flip test-time augmentation (merge '
                        'raw boxes across variants before one NMS; bbox '
                        'eval only)')
    p.add_argument('--aug-scales', type=int, nargs='*', default=None,
                   help='flat (long short) pairs, e.g. 1333 800 667 400')
    p.add_argument('--no-aug-flip', action='store_true')
    p.add_argument('--distributed', action='store_true')
    return p.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        jax.distributed.initialize()

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import load_config
    from kgdet_tpu.data.dataset import DeepFashion2Dataset
    from kgdet_tpu.eval_loop import evaluate_results, run_inference
    from kgdet_tpu.data.loader import DataLoader
    from kgdet_tpu.utils.checkpoint import load_params

    cfg = load_config(args.config)
    model = build_model(cfg)
    variables = init_variables(model, cfg)

    if args.load_pth:
        from kgdet_tpu.utils.torch_convert import (
            convert_pth, merge_into_variables)
        params, stats, skipped = convert_pth(args.load_pth)
        if skipped:
            print(f'[convert] skipped {len(skipped)} keys: {skipped[:8]}...')
        variables = merge_into_variables(variables, params, stats)
    elif args.checkpoint:
        restored = load_params(args.checkpoint)
        if 'params' in restored:
            variables = {'params': restored['params'],
                         'batch_stats': restored.get('batch_stats', {})}
        else:
            variables = restored

    dataset = DeepFashion2Dataset(cfg.val_data, train=False)
    print(f'[test] {len(dataset)} images on {jax.device_count()} device(s)',
          flush=True)
    if args.aug:
        from kgdet_tpu.eval_loop import run_inference_tta
        scales = None
        if args.aug_scales:
            pairs = args.aug_scales
            scales = [tuple(pairs[i:i + 2]) for i in range(0, len(pairs), 2)]
        results = run_inference_tta(
            model, variables, cfg, dataset, scales=scales,
            flip=not args.no_aug_flip, batch_size=args.batch_size)
        eval_types = ('bbox',)
    else:
        loader = DataLoader(
            dataset, args.batch_size or max(cfg.val_data.batch_size, 1),
            train=False, num_shards=jax.process_count(),
            shard_id=jax.process_index())
        results = run_inference(model, variables, cfg, loader)
        eval_types = tuple(args.eval)
    if cfg.detector_type == 'rpn' or 'proposal_fast' in eval_types:
        # standalone RPN: proposal recall instead of mAP
        # (reference tools/test.py --eval proposal_fast + recall.py)
        from kgdet_tpu.eval.recall import eval_proposal_recall
        rstats = eval_proposal_recall(results, dataset,
                                      proposal_nums=args.proposal_nums)
        line = ' '.join(f'{rstats[f"AR@{n}"]:.4f}'
                        for n in args.proposal_nums)
        print(f'proposal_AR_copypaste: {line}')
        return
    stats, files = evaluate_results(
        results, dataset, out_prefix=args.json_out or '/tmp/kgdet_test',
        iou_types=eval_types)
    for iou_type, s in stats.items():
        line = ' '.join(f'{v:.4f}' for k, v in s.items())
        print(f'{iou_type}_mAP_copypaste: {line}')
    print(f'[test] wrote {files}')


if __name__ == '__main__':
    main()
