"""Grid R-CNN: heatmap targets, boundary-voting decode, train + predict."""
import numpy as np
import jax
import jax.numpy as jnp

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.models.grid_head import (
    grid_neighbors, grid_refine_boxes, grid_sub_regions, grid_targets)
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch
from tests.test_two_stage import frcnn_cfg

CANVAS = TINY_CANVAS


def test_grid_sub_regions_and_neighbors():
    sub = grid_sub_regions(9, 56)
    assert sub.shape == (9, 2)
    # corners anchor at 0 / half_size; center point at ratio-based origin
    assert tuple(sub[0]) == (0, 0)
    assert tuple(sub[8]) == (28, 28)
    assert tuple(sub[4]) == (14, 14)
    nbrs = grid_neighbors(9)
    assert len(nbrs[4]) == 4 and len(nbrs[0]) == 2


def test_grid_targets_and_refine_roundtrip():
    """Perfect heatmaps at the GT grid points vote back the GT box."""
    boxes = jnp.asarray([[10., 10., 50., 42.]])
    gts = jnp.asarray([[12., 12., 46., 40.]])
    t, valid = grid_targets(boxes, gts)
    assert t.shape == (1, 28, 28, 9) and bool(valid[0])
    assert float(t.sum()) > 0
    # use the targets themselves as (logit) heatmaps: argmax sits on the
    # GT grid points, so the voted box approximates the GT
    refined = grid_refine_boxes(t * 20.0 - 10.0, boxes)
    np.testing.assert_allclose(np.asarray(refined[0]),
                               np.asarray(gts[0]), atol=1.5)


def test_grid_rcnn_train_and_predict():
    cfg = frcnn_cfg().replace(detector_type='grid_rcnn')
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    assert 'grid_head' in params
    gh = params['grid_head']
    assert 'convs_0' in gh and 'forder_4_0' in gh and 'deconv2_8' in gh

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['seed'] = jnp.int32(29)
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_rpn_cls', 'loss_cls', 'loss_grid'):
        assert np.isfinite(float(logs[k])), k
    # grid head receives gradient
    b4 = params['grid_head']['convs_0']['kernel']
    a4 = params2['grid_head']['convs_0']['kernel']
    assert np.abs(np.asarray(a4) - np.asarray(b4)).max() > 0

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()


def test_grid_head_converter_mapping():
    from kgdet_tpu.models.grid_head import GridHead
    from kgdet_tpu.utils.torch_convert import convert_state_dict

    head = GridHead()
    x = jnp.zeros((2, 14, 14, 256))
    variables = jax.jit(lambda r, t: head.init(r, t, train=True))(
        jax.random.PRNGKey(0), x)
    p = variables['params']

    rng = np.random.RandomState(0)
    state = {
        'grid_head.convs.0.conv.weight':
            rng.randn(576, 256, 3, 3).astype(np.float32),
        'grid_head.convs.0.gn.weight': rng.randn(576).astype(np.float32),
        'grid_head.forder_trans.4.1.0.weight':
            rng.randn(64, 1, 5, 5).astype(np.float32),
        'grid_head.forder_trans.4.1.1.weight':
            rng.randn(64, 64, 1, 1).astype(np.float32),
        'grid_head.deconv1.weight':
            rng.randn(576, 64, 4, 4).astype(np.float32),
        'grid_head.deconv1.bias': rng.randn(576).astype(np.float32),
        'grid_head.norm1.weight': rng.randn(576).astype(np.float32),
        'grid_head.deconv2.weight':
            rng.randn(576, 1, 4, 4).astype(np.float32),
        'grid_head.deconv2.bias': rng.randn(9).astype(np.float32),
    }
    params, _, skipped = convert_state_dict(state)
    assert not skipped, skipped
    gh = params['grid_head']
    assert gh['convs_0']['kernel'].shape == p['convs_0']['kernel'].shape
    assert gh['convs_gn_0']['scale'].shape == \
        p['convs_gn_0']['scale'].shape
    assert gh['forder_4_1']['dw']['kernel'].shape == \
        p['forder_4_1']['dw']['kernel'].shape
    assert gh['forder_4_1']['pw']['kernel'].shape == \
        p['forder_4_1']['pw']['kernel'].shape
    for i in (0, 8):
        assert gh[f'deconv1_{i}']['kernel'].shape == \
            p[f'deconv1_{i}']['kernel'].shape
        assert gh[f'deconv2_{i}']['kernel'].shape == \
            p[f'deconv2_{i}']['kernel'].shape
        assert gh[f'deconv2_{i}']['bias'].shape == (1,)
