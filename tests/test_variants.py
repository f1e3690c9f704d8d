"""Serial/parallel head variants: forward shapes, train step, MaxIoU assign."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, HeadConfig, KGDetConfig, NeckConfig,
    TestConfig)
from kgdet_tpu.core.iou_assign import assign_max_iou, iou_xyxy
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, TINY_KPTS, synth_batch

CANVAS = TINY_CANVAS


def serial_cfg(head_type='SerialKpHead'):
    return KGDetConfig(
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(in_channels=(64, 128, 256, 512), out_channels=64,
                        start_level=1, num_outs=3, add_extra_convs=True,
                        select_out=None, norm='gn', gn_groups=8),
        head=HeadConfig(
            type=head_type, num_classes=13, in_channels=64,
            feat_channels=64, point_feat_channels=64, stacked_convs=1,
            num_keypts=TINY_KPTS, num_reppts=9,
            point_strides=(8, 16, 32), gn_groups=8,
            loss_cls_weights=(1.0,), loss_bbox_weights=(0.5, 1.0),
            loss_kpt_weights=(2.0, 4.0), smooth_l1_beta=0.11),
        assigner=AssignConfig(type='PointAssigner', scale=4, pos_num=1),
        refine_assigner=AssignConfig(type='MaxIoUAssigner'),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20),
    )


# --------------------------------------------------------------- iou assign
def test_iou_xyxy_matrix():
    a = jnp.asarray([[0., 0., 10., 10.]])
    b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.],
                     [20., 20., 30., 30.]])
    iou = np.asarray(iou_xyxy(a, b))
    np.testing.assert_allclose(iou[0], [1.0, 25. / 175., 0.0], atol=1e-6)


def test_assign_max_iou_semantics():
    gts = jnp.asarray([[0., 0., 10., 10.], [20., 0., 30., 10.]])
    gt_mask = jnp.asarray([True, True])
    cands = jnp.asarray([
        [0., 0., 10., 10.],    # IoU 1.0 with gt0 -> pos
        [0., 0., 5., 10.],     # IoU 0.5 with gt0 -> pos (>= 0.5)
        [0., 0., 4.5, 10.],    # IoU 0.45 -> ignored (between 0.4 and 0.5)
        [0., 0., 3., 10.],     # IoU 0.3 -> negative
        [21., 0., 30., 10.],   # best candidate for gt1 (IoU 0.9) -> pos
        [100., 100., 110., 110.],  # IoU 0 -> negative
    ])
    valid = jnp.ones(6, bool)
    a = assign_max_iou(cands, valid, gts, gt_mask,
                       pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)
    pos = np.asarray(a.pos_mask)
    ign = np.asarray(a.ignore_mask)
    assigned = np.asarray(a.assigned_gt)
    assert pos.tolist() == [True, True, False, False, True, False]
    assert ign.tolist() == [False, False, True, False, False, False]
    assert assigned[0] == 0 and assigned[1] == 0 and assigned[4] == 1


def test_assign_max_iou_gt_claims_best_candidate():
    # gt's best candidate has IoU below pos_thr but >= min_pos_iou -> claimed
    gts = jnp.asarray([[0., 0., 10., 10.]])
    cands = jnp.asarray([[0., 0., 4., 10.],      # IoU 0.4 - best for gt
                         [50., 50., 60., 60.]])
    a = assign_max_iou(cands, jnp.ones(2, bool), gts, jnp.ones(1, bool),
                       pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)
    assert np.asarray(a.pos_mask).tolist() == [True, False]


def test_padded_gts_never_assigned():
    gts = jnp.asarray([[0., 0., 10., 10.], [0., 0., 10., 10.]])
    gt_mask = jnp.asarray([True, False])
    cands = jnp.asarray([[0., 0., 10., 10.]])
    a = assign_max_iou(cands, jnp.ones(1, bool), gts, gt_mask)
    assert int(a.assigned_gt[0]) == 0


# ------------------------------------------------------------ serial heads
@pytest.mark.parametrize('head_type', ['SerialKpHead', 'ParallelKpHead'])
def test_serial_parallel_forward_and_train(head_type):
    cfg = serial_cfg(head_type)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)

    outs = jax.jit(model.apply)(variables, jnp.zeros(
        (2, CANVAS[0], CANVAS[1], 3)))
    assert len(outs) == 3  # 3 pyramid levels
    H, W = CANVAS[0] // 8, CANVAS[1] // 8
    assert outs[0]['cls'].shape == (1, 2, H, W, 13)
    assert outs[0]['kpt'].shape == (2, 2, H, W, TINY_KPTS * 2)
    assert outs[0]['bbox'].shape == (2, 2, H, W, 4)

    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    params, opt_state, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss']))
    for k in ('loss_cls_lvl0', 'loss_bbox_init_lvl1', 'loss_kpt_refine_lvl2'):
        assert np.isfinite(float(logs[k])), k


def test_kp1rep_head_forward_and_train():
    """Single-column cascade ablation (reference Kp1RepBlock)."""
    import dataclasses
    from tests.common import tiny_cfg
    cfg = tiny_cfg()
    cfg = cfg.replace(head=dataclasses.replace(
        cfg.head, type='KGDetHead1Rep', num_reppts=9))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    outs = jax.jit(model.apply)(
        variables, jnp.zeros((2, CANVAS[0], CANVAS[1], 3)))
    H, W = CANVAS[0] // 32, CANVAS[1] // 32
    assert outs[0]['bbox'].shape == (3, 2, H, W, 4)
    # single-column DCN param names have no kernel-size suffix
    blk = variables['params']['head']['kp_rep_block_2']
    assert 'cls_dfmconv' in blk and 'cls_dfmconv_3' not in blk
    assert blk['cls_dfmconv'].shape[0] == 9

    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    _, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss']))


def test_flip_forward_equivariance():
    """Flip-ensembled head: cls maps are exactly flip-equivariant.

    Head-level property (the backbone's stride-2 convs aren't pixel-exact
    flip-equivariant, so this holds at the feature level, which is where the
    reference applies forward_single_flip).
    """
    from kgdet_tpu.models.kgdet_head import KGDetHead
    head = KGDetHead(num_classes=13, in_channels=64, feat_channels=64,
                     point_feat_channels=64, stacked_convs=1,
                     num_keypts=TINY_KPTS, gn_groups=8, flip_forward=True)
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(1, 4, 6, 64), jnp.float32)
    variables = jax.jit(head.init)(jax.random.PRNGKey(0), (feat,))
    apply = jax.jit(lambda v, f: head.apply(v, (f,)))
    out = apply(variables, feat)
    out_f = apply(variables, feat[:, :, ::-1])
    np.testing.assert_allclose(
        np.asarray(out[0]['cls']),
        np.asarray(out_f[0]['cls'][:, :, :, ::-1]), atol=2e-5)
    # keypoint offsets: y-first pairs with x negated under the flip
    kpt = np.asarray(out[0]['kpt'])
    kpt_f = np.asarray(out_f[0]['kpt'][:, :, :, ::-1])
    np.testing.assert_allclose(kpt[..., 0::2], kpt_f[..., 0::2], atol=2e-5)
    np.testing.assert_allclose(kpt[..., 1::2], -kpt_f[..., 1::2], atol=2e-5)


def test_plain_reppoints_head():
    """Upstream RepPoints (no keypoint branch): head type 'RepPointsHead'."""
    import dataclasses
    cfg = serial_cfg('RepPointsHead')
    cfg = cfg.replace(head=dataclasses.replace(
        cfg.head, type='RepPointsHead', num_keypts=1,
        loss_kpt_weights=(0.0, 0.0)))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    head_params = variables['params']['head']
    assert 'keypts_init_conv' not in head_params
    assert 'reppts_init_conv' in head_params

    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = synth_batch(K=1)
    batch = jax.tree.map(jnp.asarray, batch)
    _, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss']))
    assert float(logs['loss_kpt_refine_lvl0']) == 0.0


def test_backbone_stage_extras():
    """DCN / GCB / NonLocal stage options build and run."""
    from kgdet_tpu.models.resnet import ResNet
    m = ResNet(depth=50, num_stages=2, out_indices=(0, 1),
               dcn_stages=(1,), gcb_stages=(0,), nonlocal_stages=(1,))
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    p = variables['params']
    assert 'context_block' in p['layer1/0']
    assert 'nonlocal_block' in p['layer2/0']
    assert 'conv_offset' in p['layer2/1']['conv2']   # dcn, stride-1 block
    assert 'conv_offset' in p['layer2/0']['conv2']   # dcn, stride-2 block
    outs = jax.jit(m.apply)(variables, x)
    assert outs[0].shape == (1, 8, 8, 256)
    assert np.isfinite(np.asarray(outs[1])).all()


def test_caffe_style_bottleneck_stride_on_1x1():
    """caffe style: stride moves to conv1; output shapes unchanged."""
    from kgdet_tpu.models.resnet import Bottleneck
    x = jnp.zeros((1, 8, 8, 16))
    for style in ('pytorch', 'caffe'):
        block = Bottleneck(planes=4, stride=2, downsample=True, style=style)
        variables = jax.jit(block.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(block.apply)(variables, x)
        assert out.shape == (1, 4, 4, 16), style
    # param shapes are identical across styles (same checkpoint layout)
    pa = jax.jit(Bottleneck(planes=4, stride=2, downsample=True,
                            style='pytorch').init)(jax.random.PRNGKey(0), x)
    pb = jax.jit(Bottleneck(planes=4, stride=2, downsample=True,
                            style='caffe').init)(jax.random.PRNGKey(0), x)
    sa = jax.tree.map(lambda t: t.shape, pa)
    sb = jax.tree.map(lambda t: t.shape, pb)
    assert sa == sb
    # and the two styles genuinely compute different functions
    oa = Bottleneck(planes=4, stride=2, downsample=True,
                    style='pytorch').apply(pa, jnp.ones((1, 8, 8, 16)))
    ob = Bottleneck(planes=4, stride=2, downsample=True,
                    style='caffe').apply(pa, jnp.ones((1, 8, 8, 16)))
    assert np.abs(np.asarray(oa) - np.asarray(ob)).max() > 0


def test_generalized_attention_plugin():
    from kgdet_tpu.models.plugins import GeneralizedAttention
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 10, 36),
                    jnp.float32)
    for att_type in ('1111', '0010', '1000', '0100', '0001'):
        mod = GeneralizedAttention(num_heads=9, kv_stride=2,
                                   attention_type=att_type)
        variables = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(mod.apply)(variables, x)
        assert out.shape == x.shape, att_type
        assert np.isfinite(np.asarray(out)).all(), att_type
        # gamma starts at 0 -> identity at init (reference semantics)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-6, err_msg=att_type)
    # spatial range constraint runs
    mod = GeneralizedAttention(num_heads=4, kv_stride=2, spatial_range=3,
                               attention_type='1111')
    x2 = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 16),
                     jnp.float32)
    variables = jax.jit(mod.init)(jax.random.PRNGKey(1), x2)
    # perturb gamma so the attention output actually mixes in
    variables = jax.tree_util.tree_map(lambda t: t, variables)
    p = dict(variables['params'])
    p['gamma'] = jnp.ones_like(p['gamma'])
    out = jax.jit(mod.apply)({'params': p}, x2)
    assert np.isfinite(np.asarray(out)).all()


def test_gen_attention_stage_and_converter():
    from kgdet_tpu.models.resnet import ResNet
    from kgdet_tpu.utils.torch_convert import convert_state_dict
    m = ResNet(depth=50, num_stages=2, out_indices=(1,),
               gen_attention_stages=(1,))
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    ga = variables['params']['layer2/0']['gen_attention_block']
    assert 'query_conv' in ga and 'proj_conv' in ga

    rng = np.random.RandomState(0)
    c = 128
    state = {
        'backbone.layer2.0.gen_attention_block.query_conv.weight':
            rng.randn(c, c, 1, 1).astype(np.float32),
        'backbone.layer2.0.gen_attention_block.appr_geom_fc_x.weight':
            rng.randn(c, c // 2).astype(np.float32),
        'backbone.layer2.0.gen_attention_block.appr_bias':
            rng.randn(c).astype(np.float32),
        'backbone.layer2.0.gen_attention_block.gamma':
            np.zeros(1, np.float32),
        'backbone.layer1.0.context_block.conv_mask.weight':
            rng.randn(1, 64, 1, 1).astype(np.float32),
        'backbone.layer1.0.context_block.channel_add_conv.0.weight':
            rng.randn(4, 64, 1, 1).astype(np.float32),
        'backbone.layer1.0.context_block.channel_add_conv.1.weight':
            rng.randn(4, 1, 1).astype(np.float32),
        'backbone.layer1.0.context_block.channel_add_conv.3.weight':
            rng.randn(64, 4, 1, 1).astype(np.float32),
    }
    params, _, skipped = convert_state_dict(state)
    assert not skipped, skipped
    gab = params['backbone']['layer2/0']['gen_attention_block']
    assert gab['query_conv']['kernel'].shape == (c, c)
    assert gab['appr_geom_fc_x']['kernel'].shape == (c // 2, c)
    cb = params['backbone']['layer1/0']['context_block']
    assert cb['conv_mask']['kernel'].shape == (1, 1, 64, 1)
    assert cb['channel_add_ln']['scale'].shape == (4,)


def test_frozen_bn_calibration():
    """Stat calibration: BN inputs get real moments; passes converge."""
    from kgdet_tpu.utils.bn_calibration import calibrate_frozen_bn
    from tests.common import tiny_cfg
    cfg = tiny_cfg()
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    rng = np.random.RandomState(0)
    batches = [rng.randn(2, CANVAS[0], CANVAS[1], 3).astype(np.float32) * 3
               for _ in range(2)]
    cal, n = calibrate_frozen_bn(model, variables, batches, passes=3)
    assert n > 10
    # stem BN now holds the stem conv's real output stats, not (0, 1)
    m = np.asarray(cal['batch_stats']['backbone']['bn1']['mean'])
    v = np.asarray(cal['batch_stats']['backbone']['bn1']['var'])
    assert np.abs(m).max() > 1e-3 and np.abs(v - 1).max() > 1e-3
    # converged: one more pass barely moves the stats
    cal2, _ = calibrate_frozen_bn(model, cal, batches, passes=1)
    m2 = np.asarray(cal2['batch_stats']['backbone']['bn1']['mean'])
    np.testing.assert_allclose(m2, m, rtol=1e-4, atol=1e-5)
    # model still applies cleanly with the calibrated stats
    out = jax.jit(model.apply)(cal, jnp.asarray(batches[0]))
    assert np.isfinite(np.asarray(out[0]['cls'])).all()


def test_level_geometry_nondivisible_strides():
    """Canvas not divisible by the coarsest stride: grids must match the
    SAME-padded conv chain (ceil division). Regression for the 5-level
    serial recipe at (800, 1344), whose stride-64/128 maps are ceil-sized."""
    import dataclasses
    from kgdet_tpu.eval_loop import make_predict_fns
    cfg = serial_cfg('SerialKpHead')
    cfg = cfg.replace(
        head=dataclasses.replace(cfg.head, point_strides=(8, 16, 32, 64)),
        neck=dataclasses.replace(cfg.neck, num_outs=4))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    # 96 / 64 = 1.5 -> feature width 2 from the SAME-padded extra conv
    outs = jax.jit(model.apply)(
        variables, jnp.zeros((1, CANVAS[0], CANVAS[1], 3)))
    assert outs[3]['cls'].shape[2:4] == (1, 2)

    from kgdet_tpu.parallel.train import build_level_geometry
    grids = build_level_geometry(cfg, CANVAS)
    assert grids[3].shape[0] == 1 * 2

    step = jax.jit(make_train_step(
        model, cfg, CANVAS,
        make_optimizer(cfg, variables['params'], 100)[0]))
    opt_state = make_optimizer(cfg, variables['params'], 100)[0].init(
        variables['params'])
    batch = jax.tree.map(jnp.asarray, synth_batch(B=1))
    _, _, logs = step(variables['params'], variables['batch_stats'],
                      opt_state, batch)
    assert np.isfinite(float(logs['loss']))

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict(variables, {
        'image': jnp.zeros((1, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.]]),
        'scale_factor': jnp.asarray([1.0]),
    })
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()
