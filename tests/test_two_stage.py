"""Two-stage family: RPN proposals, RoI extraction, Faster R-CNN train/test."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import (
    BackboneConfig, HeadConfig, KGDetConfig, NeckConfig, TestConfig)
from kgdet_tpu.core.two_stage_loss import sample_pos_neg
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.models.two_stage import map_rois_to_levels, rpn_proposals
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch

CANVAS = TINY_CANVAS


def frcnn_cfg():
    return KGDetConfig(
        detector_type='faster_rcnn',
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(in_channels=(64, 128, 256, 512), out_channels=64,
                        start_level=1, num_outs=3, add_extra_convs=False,
                        select_out=None, norm=None),
        head=HeadConfig(num_classes=13, point_strides=(8, 16, 32),
                        anchor_ratios=(0.5, 1.0, 2.0)),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20),
    )


def test_sample_pos_neg_quotas():
    rng = jax.random.PRNGKey(0)
    pos = jnp.zeros(100, bool).at[:30].set(True)
    neg = jnp.zeros(100, bool).at[30:90].set(True)
    pos_sel, neg_sel = sample_pos_neg(rng, pos, neg, 40, 0.25)
    assert int(pos_sel.sum()) == 10       # quota = 40 * 0.25
    assert int(neg_sel.sum()) == 30
    assert not bool((pos_sel & ~pos).any())
    assert not bool((neg_sel & ~neg).any())
    # fewer positives than quota -> all kept
    pos2 = jnp.zeros(100, bool).at[:3].set(True)
    p2, _ = sample_pos_neg(rng, pos2, neg, 40, 0.25)
    assert int(p2.sum()) == 3


def test_map_rois_to_levels():
    wh = jnp.asarray([[10., 10.], [120., 120.], [500., 500.]])
    lvl = np.asarray(map_rois_to_levels(wh, 4, finest_scale=56))
    assert lvl[0] == 0 and lvl[1] == 1 and lvl[2] == 3


def test_rpn_proposals_shapes():
    B, A = 2, 3
    rng = np.random.RandomState(0)
    from kgdet_tpu.ops.anchors import base_anchors, grid_anchors
    anchors = [grid_anchors(base_anchors(8, [8.0], (0.5, 1.0, 2.0)),
                            4, 6, 8)]
    outs = [{'cls': jnp.asarray(rng.randn(1, B, 4, 6, A), jnp.float32),
             'bbox': jnp.asarray(rng.randn(1, B, 4, 6, A * 4) * 0.1,
                                 jnp.float32)}]
    img_hw = jnp.asarray([[32., 48.], [32., 48.]])
    props, scores, valid = rpn_proposals(outs, anchors, img_hw, nms_pre=50,
                                         max_num=16)
    assert props.shape == (B, 16, 4) and valid.shape == (B, 16)
    v = np.asarray(valid)
    p = np.asarray(props)
    assert v.any()
    assert (p[v][:, 2] >= p[v][:, 0]).all()


def test_faster_rcnn_train_and_predict():
    cfg = frcnn_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)

    params, stats = variables['params'], variables['batch_stats']
    assert 'rpn_head' in params and 'bbox_head' in params
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['seed'] = jnp.int32(7)
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox'):
        assert np.isfinite(float(logs[k])), k

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()
