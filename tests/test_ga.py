"""Guided anchoring: loc/shape targets, approx assignment, train + decode."""
import numpy as np
import jax
import jax.numpy as jnp

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, HeadConfig, KGDetConfig, NeckConfig,
    TestConfig)
from kgdet_tpu.core.ga_loss import ga_loc_targets, ga_squares
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch

CANVAS = TINY_CANVAS


def ga_cfg():
    return KGDetConfig(
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(in_channels=(64, 128, 256, 512), out_channels=64,
                        start_level=1, num_outs=3, add_extra_convs=False,
                        select_out=None, norm=None),
        head=HeadConfig(type='GARetinaHead', num_classes=13,
                        feat_channels=64, stacked_convs=1,
                        point_strides=(8, 16, 32), octave_base_scale=4,
                        scales_per_octave=3,
                        anchor_ratios=(0.5, 1.0, 2.0), norm=None),
        assigner=AssignConfig(pos_iou_thr=0.5, neg_iou_thr=0.4,
                              min_pos_iou=0.0),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20),
    )


def test_ga_loc_targets_regions():
    # one GT centered on a 16x16 level-0 grid (stride 8)
    gts = jnp.asarray([[[32., 32., 96., 96.]]])      # 64px box -> lvl 1
    mask = jnp.ones((1, 1), bool)
    targets, weights, avg = ga_loc_targets(
        gts, mask, (8, 16, 32), [(16, 16), (8, 8), (4, 4)], octave_base=4)
    # scale 65 -> log2(65/32)+0.5 = 1.5 -> floor = 1 -> level 1 (stride 16)
    t1 = np.asarray(targets[1][0])
    w1 = np.asarray(weights[1][0])
    assert t1.sum() > 0            # center region marked positive
    cy, cx = 4, 4                  # box center 64px / stride 16
    assert t1[cy, cx] == 1 and w1[cy, cx] == 1
    assert (w1 == 0).any()         # ignore band around the center
    assert np.isclose(w1[0, 0], 0.1)   # far cell is a soft negative
    # adjacent levels carry ignore weight but no positives
    t0 = np.asarray(targets[0][0])
    w0 = np.asarray(weights[0][0])
    assert t0.sum() == 0 and (w0 == 0).any()
    assert avg == (16 * 16 + 8 * 8 + 4 * 4) / 200.0


def test_ga_squares_shape():
    sq = np.asarray(ga_squares(8, 4, 4, 6))
    assert sq.shape == (24, 4)
    w = sq[:, 2] - sq[:, 0] + 1
    np.testing.assert_allclose(w, 32)


def test_ga_retina_train_and_predict():
    cfg = ga_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    head = params['head']
    for k in ('conv_loc', 'conv_shape', 'feature_adaption_cls',
              'feature_adaption_reg', 'retina_cls', 'retina_reg'):
        assert k in head, k
    assert head['conv_shape']['kernel'].shape[-1] == 2

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_cls', 'loss_bbox', 'loss_loc', 'loss_shape'):
        assert np.isfinite(float(logs[k])), k
    # shape branch receives gradient through the bounded-IoU loss
    b4 = params['head']['conv_shape']['kernel']
    a4 = params2['head']['conv_shape']['kernel']
    assert np.abs(np.asarray(a4) - np.asarray(b4)).max() > 0

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()


def test_ga_rpn_faster_rcnn_train_and_predict():
    """GA-RPN proposals drive the two-stage detector end to end."""
    from tests.test_two_stage import frcnn_cfg
    cfg = frcnn_cfg().replace(rpn_type='ga_rpn')
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    rpn = params['rpn_head']
    for k in ('rpn_conv', 'conv_loc', 'conv_shape', 'feature_adaption',
              'conv_cls', 'conv_reg'):
        assert k in rpn, k

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['seed'] = jnp.int32(23)
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_anchor_loc',
              'loss_anchor_shape', 'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(logs[k])), k
    # shape branch learns through the proposal path
    b4 = params['rpn_head']['conv_shape']['kernel']
    a4 = params2['rpn_head']['conv_shape']['kernel']
    assert np.abs(np.asarray(a4) - np.asarray(b4)).max() > 0

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()
