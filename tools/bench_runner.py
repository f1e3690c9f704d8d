"""Real-loop train throughput: one synthetic epoch through Runner.train_epoch.

bench.py --train times the bare jitted step on pre-staged device feeds; this
drives the REAL training loop — DataLoader threads, device prefetch queue,
shard_batch host->device transfers, TrainLogger — the way tools/train.py
runs it (the reference's MODEL_ZOO s/iter numbers are real-loop numbers).
Prints one JSON line with the steady-state img/s (median over logged
intervals, excluding the first, which contains the compile).

Usage:  python tools/bench_runner.py [--steps 40] [--batch 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class SyntheticFullsizeDataset:
    """Fixed-canvas synthetic samples matching DeepFashion2Dataset's train
    output contract (see data/dataset.py prepare_train)."""

    def __init__(self, n, canvas=(768, 1344), G=16, K=294, max_gts=32,
                 uint8=True):
        self.n = n
        self.canvas = canvas
        self.flags = np.zeros(n, np.int64)          # one aspect-ratio group
        rng = np.random.RandomState(0)
        # the SHIPPED data path (cfg.device_normalize=True) emits raw uint8
        # BGR and normalizes in-graph (data/dataset.py::_finalize_image);
        # emitting f32 here would silently measure the 4x-bigger transfer
        self.uint8 = uint8
        if uint8:
            self.base = rng.randint(
                0, 256, (canvas[0], canvas[1], 3)).astype(np.uint8)
        else:
            self.base = rng.randn(canvas[0], canvas[1], 3) \
                .astype(np.float32)
        self.G, self.K, self.max_gts = G, K, max_gts

    def __len__(self):
        return self.n

    def prepare_train(self, idx, rng):
        H, W = self.canvas
        Gm = self.max_gts
        boxes = np.zeros((Gm, 4), np.float32)
        boxes[:self.G, :2] = rng.uniform(0, 300, (self.G, 2))
        boxes[:self.G, 2:] = boxes[:self.G, :2] + rng.uniform(
            64, 400, (self.G, 2))
        kpts = np.zeros((Gm, self.K, 3), np.float32)
        kpts[:self.G] = rng.uniform(0, 700, (self.G, self.K, 3))
        kpts[:self.G, :, 2] = 1
        labels = np.zeros((Gm,), np.int32)
        labels[:self.G] = rng.randint(1, 14, (self.G,))
        mask = np.zeros((Gm,), bool)
        mask[:self.G] = True
        # cheap per-sample variation so no two device feeds are identical
        # (guards against relay memoization) without a 12MB randn per sample
        if self.uint8:
            img = np.roll(self.base, idx % 64, axis=1)
        else:
            img = self.base * np.float32(1.0 + (idx % 997) * 1e-4)
        return {
            'image': img,
            'valid_hw': np.asarray([750, 1333], np.int32),
            'gt_bboxes': boxes,
            'gt_labels': labels,
            'gt_kpts': kpts,
            'gt_mask': mask,
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=40)
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--interval', type=int, default=4)
    ap.add_argument('--work-dir', default='/tmp/bench_runner')
    ap.add_argument('--f32', action='store_true',
                    help='measure the host-normalized f32 transfer path '
                         'instead of the shipped uint8 one')
    args = ap.parse_args()

    import dataclasses

    from kgdet_tpu.config import KGDetConfig
    from kgdet_tpu.runner import Runner

    cfg = KGDetConfig(compute_dtype='bfloat16')
    cfg = dataclasses.replace(
        cfg, train_data=dataclasses.replace(cfg.train_data,
                                            batch_size=args.batch))
    ds = SyntheticFullsizeDataset(args.steps * args.batch,
                                  uint8=not args.f32)
    runner = Runner(cfg, work_dir=args.work_dir,
                    log_interval=args.interval)
    runner.setup(train_dataset=ds)
    runner.train_epoch()

    ips = []
    with open(os.path.join(args.work_dir, 'train_log.jsonl')) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get('mode') == 'train' and rec.get('imgs_per_sec', 0) > 0:
                ips.append(rec['imgs_per_sec'])
    steady = float(np.median(ips[1:])) if len(ips) > 1 else float('nan')
    print(json.dumps({
        'metric': f'runner_train_throughput_768x1344_b{args.batch}'
                  f'_{"f32" if args.f32 else "uint8"}',
        'value': round(steady, 2),
        'unit': 'images/sec/chip',
        'intervals': [round(v, 2) for v in ips],
    }))


if __name__ == '__main__':
    main()
