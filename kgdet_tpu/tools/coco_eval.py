"""Offline evaluation of saved result JSONs (parity: reference
tools/coco_eval.py -> mmdet.core.coco_eval).

Usage:
  python -m kgdet_tpu.tools.coco_eval --result out.bbox.json \
      --ann val.json --types bbox
  python -m kgdet_tpu.tools.coco_eval --result out.keypoints.json \
      --ann val.json --types keypoints
"""
from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--result', required=True, nargs='+',
                   help='result json file(s), aligned with --types')
    p.add_argument('--ann', required=True, help='GT annotation json')
    p.add_argument('--types', nargs='+', default=['bbox'],
                   choices=['bbox', 'keypoints', 'segm'])
    p.add_argument('--max-dets', type=int, nargs='+', default=None)
    args = p.parse_args()

    from kgdet_tpu.eval.coco import CocoIndex
    from kgdet_tpu.eval.cocoeval import CocoEvaluator

    gt = CocoIndex(args.ann)
    results = args.result
    if len(results) == 1 and len(args.types) > 1:
        results = results * len(args.types)
    for res_file, iou_type in zip(results, args.types):
        print(f'=== {iou_type}: {res_file}')
        dt = gt.load_results(res_file)
        ev = CocoEvaluator(gt, dt, iou_type)
        if args.max_dets:
            ev.params.max_dets = list(args.max_dets)
        ev.evaluate()
        ev.accumulate()
        ev.summarize(verbose=True)


if __name__ == '__main__':
    main()
