"""Demo-set overfit proof: train full KGDet on the 32 demo images and
record bbox/keypoint AP at milestones (untrained -> overfit).

Writes docs/training_proof.json incrementally; summarized by
docs/training_proof.md. Run on the TPU host:

    python tools/run_overfit_proof.py [--work-dir DIR]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)   # allow `python tools/run_overfit_proof.py`
# NOTE: do not use PYTHONPATH for this on the dev box — overriding it
# breaks the axon TPU plugin registration.


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config',
                   default=os.path.join(
                       REPO, 'configs/kgdet_moment_r50_fpn_1x_demo_overfit.py'))
    p.add_argument('--work-dir', default='/tmp/overfit_proof')
    p.add_argument('--out',
                   default=os.path.join(REPO, 'docs/training_proof.json'))
    p.add_argument('--milestones', type=int, nargs='+',
                   default=[5, 15, 30, 45, 80])
    args = p.parse_args()

    import jax

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import load_config
    from kgdet_tpu.data.dataset import DeepFashion2Dataset
    from kgdet_tpu.data.loader import DataLoader
    from kgdet_tpu.runner import Runner
    from kgdet_tpu.utils.bn_calibration import calibrate_frozen_bn

    cfg = load_config(args.config)

    # from-scratch run: calibrate the frozen BN stats on real batches first
    # (frozen identity stats leave the trunk unnormalized and the run
    # diverges — see utils/bn_calibration.py)
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    ds = DeepFashion2Dataset(cfg.train_data, train=True)
    loader = DataLoader(ds, cfg.train_data.batch_size, train=True, seed=0,
                        num_workers=2)
    images, shape0 = [], None
    for b in loader:
        if shape0 is None:
            shape0 = b['image'].shape
        if b['image'].shape == shape0:
            images.append(b['image'])
        if len(images) >= 4:
            break
    variables, n_cal = calibrate_frozen_bn(model, variables, images,
                                           passes=1)
    print(f'[proof] calibrated {n_cal} BN layers on {len(images)} batches',
          flush=True)

    runner = Runner(cfg, work_dir=args.work_dir, log_interval=16)
    runner.setup(init_from_variables=variables)
    print(f'[proof] {len(runner.train_dataset)} images, '
          f'{runner.steps_per_epoch} steps/epoch', flush=True)

    results = []
    t0 = time.time()

    def ev(tag):
        stats = runner.evaluate(verbose=False)
        rec = {
            'tag': tag, 'epoch': runner.epoch, 'step': runner.step,
            'wall_min': round((time.time() - t0) / 60, 1),
            'bbox_AP': round(float(stats['bbox']['AP']), 4),
            'bbox_AP50': round(float(stats['bbox']['AP50']), 4),
            'kpt_AP': round(float(stats['keypoints']['AP']), 4),
            'kpt_AP50': round(float(stats['keypoints']['AP50']), 4),
        }
        results.append(rec)
        print('[proof]', json.dumps(rec), flush=True)
        with open(args.out, 'w') as f:
            json.dump({'config': os.path.basename(args.config),
                       'device': jax.devices()[0].platform,
                       'results': results}, f, indent=1)

    ev('untrained')
    for m in args.milestones:
        while runner.epoch < m:
            runner.train_epoch()
        runner.save_checkpoint()
        ev(f'epoch{m}')
    print('[proof] done', flush=True)


if __name__ == '__main__':
    main()
