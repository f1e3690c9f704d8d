"""FCOS family: targets, loss, forward/train/predict."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import (
    BackboneConfig, HeadConfig, KGDetConfig, NeckConfig, TestConfig)
from kgdet_tpu.core.fcos_loss import fcos_targets, regress_ranges_for
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.ops.points import grid_points
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch

CANVAS = TINY_CANVAS


def fcos_cfg():
    return KGDetConfig(
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(in_channels=(64, 128, 256, 512), out_channels=64,
                        start_level=1, num_outs=3, add_extra_convs=True,
                        select_out=None, norm=None),
        head=HeadConfig(type='FCOSHead', num_classes=13, in_channels=64,
                        feat_channels=64, stacked_convs=1,
                        point_strides=(8, 16, 32), gn_groups=8),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20),
    )


def test_fcos_targets_semantics():
    pts = jnp.asarray(grid_points(8, 8, 8))          # stride-8 grid
    ranges = jnp.tile(jnp.asarray([-1.0, 64.0]), (64, 1))
    valid = jnp.ones(64, bool)
    gts = jnp.asarray([[8., 8., 40., 40.], [0., 0., 60., 60.]])
    labels = jnp.asarray([2, 5])
    mask = jnp.ones(2, bool)
    lab, pos, dists, ctr = fcos_targets(pts, ranges, valid, gts, labels,
                                        mask)
    lab = np.asarray(lab).reshape(8, 8)
    # point (24, 24) is inside both; smaller-area gt (gt0) wins
    assert lab[3, 3] == 2
    # point (48, 48) only inside gt1
    assert lab[6, 6] == 5
    # point (0, 0) on the border of gt1 -> not strictly inside
    assert lab[0, 0] == 0
    # centerness at the exact center of gt0 = 1
    c = np.asarray(ctr).reshape(8, 8)
    assert c[3, 3] == pytest.approx(1.0, abs=1e-3)


def test_regress_ranges_for():
    r = regress_ranges_for(3)
    assert len(r) == 3 and r[-1][1] > 1e7 and r[0] == (-1, 64)


def test_fcos_forward_train_predict():
    cfg = fcos_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    outs = jax.jit(model.apply)(variables,
                                jnp.zeros((2, CANVAS[0], CANVAS[1], 3)))
    H, W = CANVAS[0] // 8, CANVAS[1] // 8
    assert outs[0]['cls'].shape == (1, 2, H, W, 13)
    assert outs[0]['centerness'].shape == (1, 2, H, W, 1)
    assert np.all(np.asarray(outs[0]['bbox']) >= 0)  # exp-decoded distances

    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_cls', 'loss_bbox', 'loss_centerness'):
        assert np.isfinite(float(logs[k])), k

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
