"""RetinaNet family: anchors, targets, forward/train/predict."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, HeadConfig, KGDetConfig, NeckConfig,
    TestConfig)
from kgdet_tpu.core.anchor_loss import anchor_targets
from kgdet_tpu.core.bbox_transforms import delta2bbox
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.ops.anchors import anchor_valid_flags, base_anchors, \
    grid_anchors
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch

CANVAS = TINY_CANVAS


def retina_cfg():
    return KGDetConfig(
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(in_channels=(64, 128, 256, 512), out_channels=64,
                        start_level=1, num_outs=3, add_extra_convs=True,
                        select_out=None, norm=None),
        head=HeadConfig(type='RetinaHead', num_classes=13, in_channels=64,
                        feat_channels=64, stacked_convs=1,
                        point_strides=(8, 16, 32)),
        refine_assigner=AssignConfig(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                     neg_iou_thr=0.4),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20),
    )


def test_base_anchor_shapes_and_areas():
    base = base_anchors(8, [1.0, 2 ** (1 / 3)], [0.5, 1.0, 2.0])
    assert base.shape == (6, 4)
    ws = base[:, 2] - base[:, 0] + 1
    hs = base[:, 3] - base[:, 1] + 1
    # ratio h/w honored per group
    np.testing.assert_allclose((hs / ws)[:2], 0.5, rtol=1e-5)
    np.testing.assert_allclose((hs / ws)[2:4], 1.0, rtol=1e-5)
    np.testing.assert_allclose((hs / ws)[4:], 2.0, rtol=1e-5)
    # areas ~ (8 * scale)^2
    np.testing.assert_allclose(ws * hs, (8 ** 2) * np.tile(
        [1.0, 2 ** (2 / 3)], 3), rtol=1e-5)


def test_grid_anchors_tiling():
    base = base_anchors(8, [1.0], [1.0])
    g = np.asarray(grid_anchors(base, 2, 3, 16))
    assert g.shape == (6, 4)
    np.testing.assert_allclose(g[1] - g[0], [16, 0, 16, 0])
    np.testing.assert_allclose(g[3] - g[0], [0, 16, 0, 16])


def test_anchor_valid_flags_repeat():
    f = np.asarray(anchor_valid_flags(2, 2, 3, 1, 2))
    assert f.shape == (12,)
    assert f[:6].all() and not f[6:].any()


def test_anchor_targets_positive_on_matching_anchor():
    anchors = jnp.asarray([[10., 10., 50., 50.], [200., 200., 220., 220.]])
    valid = jnp.ones((1, 2), bool)
    gts = jnp.asarray([[[12., 12., 48., 48.]]])
    labels = jnp.asarray([[3]])
    mask = jnp.ones((1, 1), bool)
    lab, lw, deltas, bw, npos = anchor_targets(anchors, valid, gts, labels,
                                               mask)
    assert int(lab[0, 0]) == 3 and int(lab[0, 1]) == 0
    # decoding the target delta recovers the gt box
    back = delta2bbox(anchors[:1], deltas[0, :1])
    np.testing.assert_allclose(np.asarray(back)[0], [12, 12, 48, 48],
                               atol=1e-3)


def test_retina_forward_train_predict():
    cfg = retina_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    outs = jax.jit(model.apply)(variables,
                                jnp.zeros((2, CANVAS[0], CANVAS[1], 3)))
    H, W = CANVAS[0] // 8, CANVAS[1] // 8
    assert outs[0]['cls'].shape == (1, 2, H, W, 9 * 13)
    assert outs[0]['bbox'].shape == (1, 2, H, W, 9 * 4)

    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    params2, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss']))
    assert np.isfinite(float(logs['loss_cls']))
    assert np.isfinite(float(logs['loss_bbox']))

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
