"""End-to-end train-step + predict integration on synthetic data (tiny model).

Uses the ResNet-18/64ch/12-kpt config from tests.common so the suite stays
fast on the 1-core CPU harness; the full-size model is exercised on real
hardware by bench.py and __graft_entry__.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables, make_predict_fn
from kgdet_tpu.config import KGDetConfig
from kgdet_tpu.parallel.train import (
    frozen_param_mask, make_lr_schedule, make_optimizer, make_train_step)
from tests.common import TINY_CANVAS, TINY_KPTS, synth_batch, tiny_cfg

CANVAS = TINY_CANVAS


@pytest.fixture(scope='module')
def trained_once():
    """Build model/optimizer once and run 3 train steps; shared by tests."""
    cfg = tiny_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, batch_stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    losses, logs = [], None
    params0 = params
    for _ in range(3):
        params, opt_state, logs = step(params, batch_stats, opt_state, batch)
        losses.append(float(logs['loss']))
    return dict(cfg=cfg, model=model, params0=params0, params=params,
                batch_stats=batch_stats, losses=losses, logs=logs)


def test_train_step_runs_and_is_finite(trained_once):
    losses = trained_once['losses']
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 1.5  # not exploding
    for k in ('loss_cls_1', 'loss_bbox_3', 'loss_kpt_2'):
        assert np.isfinite(float(trained_once['logs'][k]))


def test_frozen_params_do_not_move(trained_once):
    p0, p1 = trained_once['params0'], trained_once['params']
    before = p0['backbone']['layer1/0']['conv1']['kernel']
    after = p1['backbone']['layer1/0']['conv1']['kernel']
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    before_free = p0['backbone']['layer3/0']['conv1']['kernel']
    after_free = p1['backbone']['layer3/0']['conv1']['kernel']
    assert np.abs(np.asarray(after_free) - np.asarray(before_free)).max() > 0


def test_lr_schedule_shape():
    cfg = KGDetConfig()
    sched = make_lr_schedule(cfg, steps_per_epoch=1000)
    assert float(sched(0)) == pytest.approx(cfg.optim.lr / 3, rel=1e-3)
    assert float(sched(500)) == pytest.approx(cfg.optim.lr, rel=1e-3)
    assert float(sched(5000)) == pytest.approx(cfg.optim.lr)
    assert float(sched(8 * 1000 + 1)) == pytest.approx(cfg.optim.lr * 0.1)
    assert float(sched(11 * 1000 + 1)) == pytest.approx(cfg.optim.lr * 0.01)


def test_predict_fn_shapes(trained_once):
    cfg, model = trained_once['cfg'], trained_once['model']
    variables = {'params': trained_once['params'],
                 'batch_stats': trained_once['batch_stats']}
    predict = make_predict_fn(model, cfg, CANVAS)
    B = 2
    batch = {
        'image': jnp.zeros((B, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.5, 2.0]),
    }
    dets = predict(variables, batch)
    M = cfg.test.max_per_img
    assert dets['det_bboxes'].shape == (B, M, 5)
    assert dets['det_kpts'].shape == (B, M, TINY_KPTS * 3)
    assert dets['valid'].shape == (B, M)


def test_frozen_stage_gradient_cut():
    """frozen_stages also cuts the backward (resnet.py stop_gradient):
    grads below the cut are exactly zero at the loss level, and free-stage
    grads are bit-identical to a no-cut build (the cut only removes dead
    gradient paths — every path below it ends in a masked param)."""
    from kgdet_tpu.models.resnet import ResNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))

    def grads_of(frozen):
        net = ResNet(depth=18, frozen_stages=frozen)
        variables = net.init(jax.random.PRNGKey(0), x)

        def loss(p):
            outs = net.apply(
                {'params': p, 'batch_stats': variables['batch_stats']}, x)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

        return jax.grad(loss)(variables['params'])

    g_cut = grads_of(1)
    g_ref = grads_of(-1)
    frozen_keys = [k for k in g_cut
                   if k in ('conv1', 'bn1') or k.startswith('layer1')]
    free_keys = [k for k in g_cut if k not in frozen_keys]
    assert frozen_keys and free_keys
    for k in frozen_keys:
        for leaf in jax.tree_util.tree_leaves(g_cut[k]):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    for k in free_keys:
        ref_leaves = jax.tree_util.tree_leaves(g_ref[k])
        for leaf, ref in zip(jax.tree_util.tree_leaves(g_cut[k]), ref_leaves):
            np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                       rtol=1e-6, atol=1e-6)


def test_stem_conv_odd_shapes_exact():
    """The width-packed stem falls back exactly on odd H/W inputs."""
    from jax import lax
    from kgdet_tpu.models.resnet import s2d_stem_conv

    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    for H, W in ((31, 47), (32, 47), (31, 48), (30, 46)):
        x = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
        want = lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        got = s2d_stem_conv(x, w)
        assert got.shape == want.shape, (H, W)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)
