"""End-to-end train-step + predict integration on synthetic data (tiny)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from kgdet_tpu.api import build_model, init_variables, make_predict_fn
from kgdet_tpu.config import KGDetConfig
from kgdet_tpu.parallel.train import (
    frozen_param_mask, make_lr_schedule, make_optimizer, make_train_step)

CANVAS = (96, 128)


def tiny_cfg():
    return KGDetConfig()


def synth_batch(B=2, G=4, K=294):
    rng = np.random.RandomState(0)
    img = rng.randn(B, CANVAS[0], CANVAS[1], 3).astype(np.float32)
    ctr = rng.uniform(20, 90, (B, G, 2))
    wh = rng.uniform(30, 60, (B, G, 2))
    gts = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    labels = rng.randint(1, 14, (B, G)).astype(np.int32)
    kpts = rng.uniform(10, 90, (B, G, K, 3)).astype(np.float32)
    kpts[..., 2] = (rng.rand(B, G, K) > 0.5).astype(np.float32)
    mask = np.ones((B, G), bool)
    mask[:, -1] = False
    return {
        'image': jnp.asarray(img),
        'valid_hw': jnp.asarray(np.tile(np.asarray(CANVAS), (B, 1))),
        'gt_bboxes': jnp.asarray(gts),
        'gt_labels': jnp.asarray(labels),
        'gt_kpts': jnp.asarray(kpts),
        'gt_mask': jnp.asarray(mask),
    }


def test_train_step_runs_and_improves():
    cfg = tiny_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, batch_stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = synth_batch()
    losses = []
    for _ in range(3):
        params, opt_state, logs = step(params, batch_stats, opt_state, batch)
        losses.append(float(logs['loss']))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 1.5  # not exploding
    for k in ('loss_cls_1', 'loss_bbox_3', 'loss_kpt_2'):
        assert np.isfinite(float(logs[k]))


def test_frozen_params_do_not_move():
    cfg = tiny_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, batch_stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    before = params['backbone']['layer1/0']['conv1']['kernel']
    before_free = params['backbone']['layer3/0']['conv1']['kernel']
    params2, _, _ = step(params, batch_stats, opt_state, synth_batch())
    after = params2['backbone']['layer1/0']['conv1']['kernel']
    after_free = params2['backbone']['layer3/0']['conv1']['kernel']
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    assert np.abs(np.asarray(after_free) - np.asarray(before_free)).max() > 0


def test_lr_schedule_shape():
    cfg = tiny_cfg()
    sched = make_lr_schedule(cfg, steps_per_epoch=1000)
    lr0 = float(sched(0))
    lr_warm_end = float(sched(500))
    lr_mid = float(sched(5000))
    lr_late = float(sched(8 * 1000 + 1))
    lr_final = float(sched(11 * 1000 + 1))
    assert lr0 == pytest.approx(cfg.optim.lr / 3, rel=1e-3)
    assert lr_warm_end == pytest.approx(cfg.optim.lr, rel=1e-3)
    assert lr_mid == pytest.approx(cfg.optim.lr)
    assert lr_late == pytest.approx(cfg.optim.lr * 0.1)
    assert lr_final == pytest.approx(cfg.optim.lr * 0.01)


def test_predict_fn_shapes():
    cfg = tiny_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    predict = make_predict_fn(model, cfg, CANVAS)
    B = 2
    batch = {
        'image': jnp.zeros((B, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[90., 120.], [96., 128.]]),
        'scale_factor': jnp.asarray([1.5, 2.0]),
    }
    dets = predict(variables, batch)
    M = cfg.test.max_per_img
    assert dets['det_bboxes'].shape == (B, M, 5)
    assert dets['det_kpts'].shape == (B, M, 294 * 3)
    assert dets['valid'].shape == (B, M)
