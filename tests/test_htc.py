"""HTC (without-semantic): cascade + per-stage mask heads with info flow."""
import numpy as np
import jax
import jax.numpy as jnp

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import DataConfig
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch
from tests.test_two_stage import frcnn_cfg

CANVAS = TINY_CANVAS


def htc_cfg():
    return frcnn_cfg().replace(
        detector_type='htc',
        train_data=DataConfig(with_mask=True, mask_stride=4, max_gts=4))


def test_htc_train_and_predict():
    cfg = htc_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    # 3 box stages + 3 mask heads; stages 1/2 carry the info-flow conv
    for i in range(3):
        assert f'bbox_head_{i}' in params and f'mask_head_{i}' in params
    assert 'conv_res' not in params['mask_head_0']
    assert 'conv_res' in params['mask_head_1']
    assert 'conv_res' in params['mask_head_2']

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    rng = np.random.RandomState(0)
    batch['gt_masks'] = jnp.asarray(
        (rng.rand(2, 4, CANVAS[0] // 4, CANVAS[1] // 4) > 0.5)
        .astype(np.float32))
    batch['seed'] = jnp.int32(31)
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_cls_s0', 'loss_mask_s0', 'loss_mask_s2'):
        assert np.isfinite(float(logs[k])), k
    # info-flow conv receives gradient (mask stages are coupled)
    b4 = params['mask_head_1']['conv_res']['kernel']
    a4 = params2['mask_head_1']['conv_res']['kernel']
    assert np.abs(np.asarray(a4) - np.asarray(b4)).max() > 0

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
    assert dets['det_masks'].shape[2:] == (28, 28)
    probs = np.asarray(dets['det_masks'])
    assert ((probs >= 0) & (probs <= 1)).all()
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()
