"""Backbone/neck tail: ResNeXt, SSDVGG, HRNet, HRFPN, BFP — shapes,
config-driven builds, train steps, and converter round trips."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, HeadConfig, KGDetConfig, NeckConfig,
    TestConfig)
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch

CANVAS = TINY_CANVAS


# ----------------------------------------------------------------- ResNeXt
def test_resnext_grouped_bottleneck_shapes():
    from kgdet_tpu.models.resnet import ResNeXt
    m = ResNeXt(depth=50, groups=4, base_width=4)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # grouped conv2 kernel: (3, 3, width/groups, width)
    k = v['params']['layer1/0']['conv2']['kernel']
    width = int(64 * (4 / 64)) * 4       # = 16
    assert k.shape == (3, 3, width // 4, width)


def test_resnext_config_driven_train_step():
    cfg = KGDetConfig(
        backbone=BackboneConfig(type='ResNeXt', depth=50, groups=4,
                                base_width=4),
        neck=NeckConfig(in_channels=(256, 512, 1024, 2048), out_channels=64,
                        start_level=1, num_outs=1, add_extra_convs=False,
                        select_out=(0,)),
        head=HeadConfig(num_classes=13, in_channels=64, feat_channels=64,
                        point_feat_channels=64, stacked_convs=1,
                        num_keypts=8, point_strides=(8,), gn_groups=8),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch(K=8))
    _, _, logs = step(params, stats, tx.init(params), batch)
    assert np.isfinite(float(logs['loss']))


# ------------------------------------------------------------------ SSDVGG
def ssdvgg_cfg():
    return KGDetConfig(
        backbone=BackboneConfig(type='SSDVGG', depth=16, vgg_input_size=300),
        neck=NeckConfig(type='Identity', out_channels=256),
        head=HeadConfig(type='SSDHead', num_classes=13,
                        point_strides=(8, 16, 32, 64, 100, 300),
                        ssd_input_size=300,
                        ssd_basesize_ratio_range=(0.15, 0.9),
                        ssd_anchor_ratios=((2,), (2, 3), (2, 3), (2, 3),
                                           (2,), (2,))),
        assigner=AssignConfig(pos_iou_thr=0.5, neg_iou_thr=0.5,
                              min_pos_iou=0.2),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20))


def test_ssdvgg_pyramid_matches_reference_geometry():
    from kgdet_tpu.models.vgg import SSDVGG
    m = SSDVGG(depth=16, input_size=300)
    x = jnp.zeros((1, 300, 300, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [tuple(o.shape[1:]) for o in outs] == [
        (38, 38, 512), (19, 19, 1024), (10, 10, 512),
        (5, 5, 256), (3, 3, 256), (1, 1, 256)]
    # conv4_3 output is L2-normalized with the learned scale (init 20)
    n = np.linalg.norm(np.asarray(outs[0][0, 0, 0]))
    assert outs[0].shape[-1] == 512


def test_ssdvgg_ssd300_train_and_predict():
    """The reference ssd300 recipe is representable end to end."""
    cfg = ssdvgg_cfg()
    canvas = (300, 300)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=(64, 64))
    params = variables['params']
    stats = variables.get('batch_stats', {})   # VGG trunk has no BN
    assert 'features_0' in params['backbone']
    assert 'l2_norm' in params['backbone']

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg, canvas, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch(canvas=canvas, K=8))
    _, _, logs = step(params, stats, tx.init(params), batch)
    assert np.isfinite(float(logs['loss']))

    predict = make_predict_fns(model, cfg, [canvas])[tuple(canvas)]
    dets = predict(variables, {
        'image': jnp.zeros((2, 300, 300, 3)),
        'img_hw': jnp.asarray([[300., 300.], [280., 300.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()


# ------------------------------------------------------------------- HRNet
def hrnet_cfg():
    return KGDetConfig(
        backbone=BackboneConfig(type='HRNet', hrnet_width=8),
        neck=NeckConfig(type='HRFPN', in_channels=(8, 16, 32, 64),
                        out_channels=32, num_outs=3, select_out=None),
        head=HeadConfig(type='RetinaHead', num_classes=13, in_channels=32,
                        feat_channels=32, stacked_convs=1,
                        point_strides=(4, 8, 16)),
        refine_assigner=AssignConfig(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                     neg_iou_thr=0.4),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20))


def test_hrnet_branch_shapes():
    from kgdet_tpu.models.hrnet import HRNet
    m = HRNet(width=8)
    x = jnp.zeros((1, 64, 96, 3))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    # four branches at strides 4/8/16/32, widths w..8w
    assert [tuple(o.shape[1:]) for o in outs] == [
        (16, 24, 8), (8, 12, 16), (4, 6, 32), (2, 3, 64)]
    p = v['params']
    assert 'transition1/0/0/conv' in p and 'transition1/1/0/conv' in p
    assert 'stage3/0/fuse_layers/0/1/conv' in p
    assert 'stage4/2/branches/3/3' in p


def test_hrnet_hrfpn_retina_train_step():
    cfg = hrnet_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    assert 'reduction_conv' in params['neck']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch(K=8))
    params2, _, logs = step(params, stats, tx.init(params), batch)
    assert np.isfinite(float(logs['loss']))
    w0 = np.asarray(
        variables['params']['backbone']['stage2/0/fuse_layers/0/1/conv']
        ['kernel'])
    w1 = np.asarray(
        params2['backbone']['stage2/0/fuse_layers/0/1/conv']['kernel'])
    assert not np.allclose(w0, w1)


def test_hrnet_converter_roundtrip():
    """HRNet torch names (stem/transitions/stages/fuse) convert with no
    skips and land on the right flax leaves."""
    from kgdet_tpu.models.hrnet import HRNet
    from kgdet_tpu.utils.torch_convert import (
        convert_state_dict, merge_into_variables)
    torch = pytest.importorskip('torch')

    m = HRNet(width=8)
    x = jnp.zeros((1, 64, 64, 3))
    raw = dict(jax.jit(m.init)(jax.random.PRNGKey(0), x))
    # converter targets live under a 'backbone' module like in a detector
    variables = {'params': {'backbone': raw['params']},
                 'batch_stats': {'backbone': raw['batch_stats']}}

    state = {}

    def t_conv(v):
        return torch.tensor(np.transpose(np.asarray(v), (3, 2, 0, 1)))

    def emit(tree, path):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict):
                emit(v, p)
                continue
            mod = '/'.join(p[:-1])
            leaf = p[-1]
            if p[0].startswith('transition') or 'fuse_layers' in mod:
                base = mod.replace('/conv', '/0').replace('/bn', '/1') \
                    .replace('/', '.')
                if leaf == 'kernel':
                    state[f'backbone.{base}.weight'] = t_conv(v)
                else:
                    state[f'backbone.{base}.'
                          f'{"weight" if leaf == "scale" else "bias"}'] = \
                        torch.tensor(np.asarray(v))
            else:
                name = mod.replace('downsample_conv', 'downsample.0') \
                    .replace('downsample_bn', 'downsample.1') \
                    .replace('/', '.')
                if leaf == 'kernel':
                    state[f'backbone.{name}.weight'] = t_conv(v)
                else:
                    state[f'backbone.{name}.'
                          f'{"weight" if leaf == "scale" else "bias"}'] = \
                        torch.tensor(np.asarray(v))

    def emit_stats(tree, path):
        for k, v in tree.items():
            p = path + [k]
            if isinstance(v, dict) and any(
                    isinstance(x, dict) for x in v.values()):
                emit_stats(v, p)
            elif isinstance(v, dict):
                mod = '/'.join(p)
                if p[0].startswith('transition') or 'fuse_layers' in mod:
                    base = mod.replace('/bn', '/1').replace('/', '.')
                else:
                    base = mod.replace('downsample_bn', 'downsample.1') \
                        .replace('/', '.')
                for leaf, arr in v.items():
                    tleaf = {'mean': 'running_mean',
                             'var': 'running_var'}[leaf]
                    state[f'backbone.{base}.{tleaf}'] = torch.tensor(
                        np.asarray(arr))

    emit(raw['params'], [])
    emit_stats(raw['batch_stats'], [])

    params, stats, skipped = convert_state_dict(state)
    assert not skipped, skipped[:5]
    merged = merge_into_variables(variables, params, stats, strict=True)
    a = jax.tree_util.tree_leaves(variables['params'])
    b = jax.tree_util.tree_leaves(merged['params'])
    for x_, y_ in zip(a, b):
        np.testing.assert_allclose(np.asarray(x_), np.asarray(y_),
                                   atol=1e-6)


# --------------------------------------------------------------------- BFP
def test_fpnbfp_neck_forward_and_train():
    cfg = KGDetConfig(
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(type='FPNBFP', in_channels=(64, 128, 256, 512),
                        out_channels=64, start_level=1, num_outs=3,
                        add_extra_convs=False, select_out=None, norm=None,
                        bfp_refine_level=1, bfp_refine_type='non_local'),
        head=HeadConfig(type='RetinaHead', num_classes=13, in_channels=64,
                        feat_channels=64, stacked_convs=1,
                        point_strides=(8, 16, 32)),
        refine_assigner=AssignConfig(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                     neg_iou_thr=0.4),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    assert 'bfp' in params['neck'] and 'refine' in params['neck']['bfp']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch(K=8))
    _, _, logs = step(params, stats, tx.init(params), batch)
    assert np.isfinite(float(logs['loss']))


def test_bfp_residual_identity_when_refine_zero():
    """BFP output = input + resized mean; with a conv refine zero-init'd
    the residual equals the gathered mean at each level."""
    from kgdet_tpu.models.necks_extra import BFP
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, s, s, 4).astype(np.float32))
             for s in (16, 8, 4)]
    m = BFP(out_channels=4, num_levels=3, refine_level=1, refine_type=None)
    v = m.init(jax.random.PRNGKey(0), feats)
    outs = m.apply(v, feats)
    assert [o.shape for o in outs] == [f.shape for f in feats]
    # level-1 (refine level) residual is exactly the gathered average
    import flax.linen as fnn
    g0 = np.asarray(fnn.max_pool(feats[0], (2, 2), strides=(2, 2)))
    g2 = np.asarray(jax.image.resize(feats[2], (1, 8, 8, 4), 'nearest'))
    mean = (g0 + np.asarray(feats[1]) + g2) / 3
    np.testing.assert_allclose(np.asarray(outs[1]),
                               np.asarray(feats[1]) + mean, atol=1e-5)
