"""SSD head: anchor recipe, MultiBox loss with hard negatives, decode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, HeadConfig, KGDetConfig, NeckConfig,
    TestConfig)
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.ops.anchors import ssd_anchor_params, ssd_base_anchors
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch

CANVAS = TINY_CANVAS


def ssd_cfg():
    return KGDetConfig(
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(in_channels=(64, 128, 256, 512), out_channels=64,
                        start_level=1, num_outs=3, add_extra_convs=False,
                        select_out=None, norm=None),
        head=HeadConfig(type='SSDHead', num_classes=13,
                        point_strides=(8, 16, 32),
                        ssd_input_size=300,
                        ssd_basesize_ratio_range=(0.15, 0.9),
                        ssd_anchor_ratios=((2,), (2, 3), (2,))),
        assigner=AssignConfig(pos_iou_thr=0.5, neg_iou_thr=0.5,
                              min_pos_iou=0.2),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20),
    )


def test_ssd300_anchor_recipe_matches_reference():
    """The canonical SSD300-COCO sizes (ssd_head.py:50-73)."""
    mins, maxs = ssd_anchor_params(300, 6, (0.15, 0.9))
    assert mins == [21, 45, 99, 153, 207, 261]
    assert maxs == [45, 99, 153, 207, 261, 315]
    base = ssd_base_anchors(21, 45, 8, (2,))
    assert base.shape == (4, 4)
    w = base[:, 2] - base[:, 0] + 1
    h = base[:, 3] - base[:, 1] + 1
    np.testing.assert_allclose(w[0], 21, rtol=1e-6)
    np.testing.assert_allclose(w[1], np.sqrt(21 * 45), rtol=1e-6)
    # ratio anchors keep sqrt(w*h) == min_size
    np.testing.assert_allclose(np.sqrt(w[2] * h[2]), 21, rtol=1e-6)
    # ratio list order is (1/r, r) with ratio = h/w (reference ssd_head
    # builds ratios [1, 1/r, r] after the two ratio-1 scales)
    np.testing.assert_allclose(h[2] / w[2], 0.5, rtol=1e-5)
    np.testing.assert_allclose(h[3] / w[3], 2.0, rtol=1e-5)


def test_ssd_train_and_predict():
    cfg = ssd_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    # per-level conv pairs sized by that level's anchor count
    assert params['head']['cls_convs_0']['kernel'].shape[-1] == 4 * 14
    assert params['head']['cls_convs_1']['kernel'].shape[-1] == 6 * 14
    assert params['head']['reg_convs_2']['kernel'].shape[-1] == 4 * 4

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_cls', 'loss_bbox'):
        assert np.isfinite(float(logs[k])), k
    assert float(logs['num_pos']) >= 1

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()


def test_ssd_hard_negative_quota():
    """Selected negatives == neg_pos_ratio * positives when enough exist."""
    from kgdet_tpu.core.anchor_loss import ssd_loss
    from kgdet_tpu.models.ssd_head import SSDHead
    from kgdet_tpu.ops.anchors import grid_anchors

    cfg = ssd_cfg()
    head = SSDHead(num_classes=13, anchor_strides=(8,),
                   input_size=300, basesize_ratio_range=(0.15, 0.9),
                   anchor_ratios=((2,),))
    fh, fw = 8, 12
    base = head.base_anchors_per_level()[0]
    anchors = [grid_anchors(base, fh, fw, 8)]
    P = fh * fw * 4
    rng = np.random.RandomState(0)
    outs = [{'cls': jnp.asarray(rng.randn(1, 1, fh, fw, 4 * 14),
                                jnp.float32),
             'bbox': jnp.zeros((1, 1, fh, fw, 16), jnp.float32)}]
    valids = [jnp.ones((1, P), bool)]
    batch = {
        'gt_bboxes': jnp.asarray([[[8., 8., 30., 30.]]]),
        'gt_labels': jnp.asarray([[3]]),
        'gt_mask': jnp.ones((1, 1), bool),
    }
    total, logs = ssd_loss(outs, anchors, valids, batch, cfg.head,
                           cfg.assigner)
    assert np.isfinite(float(total))
    assert float(logs['num_pos']) >= 1
