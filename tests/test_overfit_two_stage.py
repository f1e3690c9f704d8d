"""Two-stage learning proof: tiny Faster R-CNN (and cascade) overfit fixed
synthetic images to high train-set AP.

Round-2 verdict gap: two-stage tests asserted one-step finiteness only, so
a sign-flipped RCNN loss or broken proposal assignment would pass. These
tests require the trained detector to actually localize the GTs
(template: tests/test_overfit.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import OptimConfig
from kgdet_tpu.core.postprocess import detections_to_per_class
from kgdet_tpu.eval.mean_ap import eval_map
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS
from tests.test_overfit import overfit_batch
from tests.test_two_stage import frcnn_cfg

H, W = TINY_CANVAS


def _run_overfit(cfg, steps=300, target_ap=0.5):
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=TINY_CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=10 ** 6)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, TINY_CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, overfit_batch())

    predict = make_predict_fns(model, cfg, [TINY_CANVAS])[TINY_CANVAS]
    feed = {'image': batch['image'],
            'img_hw': jnp.asarray([[H, W]] * 2, jnp.float32),
            'scale_factor': jnp.ones((2,), jnp.float32)}
    gt_b = [np.asarray(batch['gt_bboxes'][b])[
        np.asarray(batch['gt_mask'][b])] for b in range(2)]
    gt_l = [np.asarray(batch['gt_labels'][b])[
        np.asarray(batch['gt_mask'][b])] for b in range(2)]

    def evaluate(p):
        dets = predict({'params': p, 'batch_stats': stats}, feed)
        per = detections_to_per_class(dets, num_classes=13)
        m, _ = eval_map([r[0] for r in per], gt_b, gt_l, iou_thr=0.5)
        return m

    ap0 = evaluate(params)
    losses = []
    ap = 0.0
    for i in range(steps):
        batch['seed'] = jnp.int32(i)     # fresh sampler draw each step
        params, opt_state, logs = step(params, stats, opt_state, batch)
        losses.append(float(logs['loss']))
        if i >= 149 and (i + 1) % 50 == 0:
            ap = evaluate(params)
            if ap >= 0.99:
                break
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])
    assert ap >= target_ap, f'train-set AP@0.5 {ap} (untrained {ap0})'
    assert ap > ap0 + 0.3
    return ap


def test_faster_rcnn_overfits_to_high_ap():
    cfg = frcnn_cfg().replace(
        optim=OptimConfig(type='adam', lr=1e-3, warmup_iters=10,
                          lr_step_epochs=(1000,), total_epochs=1))
    _run_overfit(cfg, steps=300, target_ap=0.5)


def test_cascade_rcnn_overfits_to_high_ap():
    cfg = frcnn_cfg().replace(
        detector_type='cascade_rcnn',
        optim=OptimConfig(type='adam', lr=1e-3, warmup_iters=10,
                          lr_step_epochs=(1000,), total_epochs=1))
    _run_overfit(cfg, steps=300, target_ap=0.5)
