"""Cascade R-CNN: stage refinement, per-stage losses, stage-mean decode."""
import numpy as np
import jax
import jax.numpy as jnp

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch
from tests.test_two_stage import frcnn_cfg

CANVAS = TINY_CANVAS


def cascade_cfg():
    return frcnn_cfg().replace(detector_type='cascade_rcnn')


def test_cascade_rcnn_train_and_predict():
    cfg = cascade_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    # three stage heads with class-agnostic regression
    for i in range(3):
        head = params[f'bbox_head_{i}']
        assert head['fc_reg']['kernel'].shape[-1] == 4
        assert head['fc_cls']['kernel'].shape[-1] == 14

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['seed'] = jnp.int32(5)
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_rpn_cls', 'loss_cls_s0', 'loss_bbox_s1', 'loss_cls_s2'):
        assert np.isfinite(float(logs[k])), k
    # every stage head received gradient
    for i in range(3):
        before = params[f'bbox_head_{i}']['fc_cls']['kernel']
        after = params2[f'bbox_head_{i}']['fc_cls']['kernel']
        assert np.abs(np.asarray(after) - np.asarray(before)).max() > 0, i

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()


def test_cascade_stage_refinement_changes_rois():
    """Stage i>0 must consume refined (not original) proposals."""
    cfg = cascade_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    batch = jax.tree.map(jnp.asarray, synth_batch())
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=True))(
        variables, batch['image'])
    s0 = np.asarray(fwd['stages'][0]['proposals'])
    s1 = np.asarray(fwd['stages'][1]['proposals'])
    valid = np.asarray(fwd['proposal_valid'])
    assert np.abs(s1[valid] - s0[valid]).max() > 0


def test_cascade_converter_maps_stage_heads():
    from kgdet_tpu.utils.torch_convert import convert_state_dict
    rng = np.random.RandomState(0)
    state = {
        'bbox_head.1.fc_cls.weight': rng.randn(14, 1024).astype(np.float32),
        'bbox_head.1.fc_cls.bias': rng.randn(14).astype(np.float32),
        'bbox_head.2.shared_fcs.1.weight':
            rng.randn(1024, 1024).astype(np.float32),
    }
    params, _, skipped = convert_state_dict(state)
    assert not skipped
    assert params['bbox_head_1']['fc_cls']['kernel'].shape == (1024, 14)
    assert params['bbox_head_2']['shared_fc_1']['kernel'].shape == \
        (1024, 1024)


def test_cascade_dcn_backbone_plumbthrough():
    """The two-stage family honors backbone extras from the config: a
    cascade with a DCN stage must actually build (and train) DCN params
    (round-2 verdict: the hard-coded ResNet silently dropped them)."""
    import dataclasses

    from kgdet_tpu.config import BackboneConfig
    cfg = cascade_cfg()
    # depth-18 BasicBlocks have no DCN slot; use depth 50 at tiny canvas
    cfg = cfg.replace(
        backbone=BackboneConfig(depth=50, dcn_stages=(2, 3)),
        neck=dataclasses.replace(cfg.neck,
                                 in_channels=(256, 512, 1024, 2048)))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    blk = params['backbone']['layer3/0']['conv2']
    assert 'conv_offset' in blk and 'weight' in blk  # DCN, not plain conv

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['seed'] = jnp.int32(1)
    params2, _, logs = step(params, stats, tx.init(params), batch)
    assert np.isfinite(float(logs['loss']))
    w0 = np.asarray(blk['weight'])
    w1 = np.asarray(params2['backbone']['layer3/0']['conv2']['weight'])
    assert not np.allclose(w0, w1)
