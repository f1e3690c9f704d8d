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
        num_proposals_train=64, num_proposals_test=64,
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


def test_rcnn_accuracy_metric():
    """acc = 100 * top-1 correct over the sampled RoIs (reference
    mmdet/models/losses/accuracy.py semantics, logged by bbox_head.loss)."""
    from kgdet_tpu.core.two_stage_loss import rcnn_targets_and_loss
    B, R, C = 1, 8, 5   # 4 fg classes + background at 0
    gts = jnp.asarray([[[0., 0., 10., 10.], [20., 20., 30., 30.]]])
    labels = jnp.asarray([[2, 3]], jnp.int32)
    mask = jnp.ones((1, 2), bool)
    # proposals: the two GT boxes (positives) + far-away negatives
    props = jnp.asarray([[[0., 0., 10., 10.], [20., 20., 30., 30.]]
                         + [[40. + 10 * i, 40., 45. + 10 * i, 45.]
                            for i in range(6)]])
    valid = jnp.ones((B, R), bool)
    batch = {'gt_bboxes': gts, 'gt_labels': labels, 'gt_mask': mask}
    onehot = jax.nn.one_hot(jnp.asarray([2, 3, 0, 0, 0, 0, 0, 0]), C) * 10.0
    roi_reg = jnp.zeros((B, R, C * 4))
    _, _, aux = rcnn_targets_and_loss(
        props, valid, onehot[None], roi_reg, batch, jax.random.PRNGKey(0),
        num_classes=C, num_samples=R, pos_fraction=0.5)
    assert float(aux['acc']) == 100.0
    # every prediction wrong -> 0
    wrong = jax.nn.one_hot(jnp.asarray([1, 1, 1, 1, 1, 1, 1, 1]), C) * 10.0
    _, _, aux = rcnn_targets_and_loss(
        props, valid, wrong[None], roi_reg, batch, jax.random.PRNGKey(0),
        num_classes=C, num_samples=R, pos_fraction=0.5)
    assert float(aux['acc']) == 0.0


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
    # RCNN classification accuracy is logged (reference losses/accuracy.py)
    assert 0.0 <= float(logs['acc']) <= 100.0

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_bboxes'].shape == (2, 20, 5)
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()


def test_mask_rcnn_train_and_predict():
    import dataclasses
    from kgdet_tpu.config import DataConfig
    from kgdet_tpu.models.mask_head import mask_targets, paste_masks
    cfg = frcnn_cfg().replace(
        detector_type='mask_rcnn',
        train_data=DataConfig(with_mask=True, mask_stride=4, max_gts=4))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    assert 'mask_head' in variables['params']

    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    rng = np.random.RandomState(0)
    batch['gt_masks'] = jnp.asarray(
        (rng.rand(2, 4, CANVAS[0] // 4, CANVAS[1] // 4) > 0.5)
        .astype(np.float32))
    batch['seed'] = jnp.int32(3)
    _, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss_mask']))

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict(variables, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert dets['det_masks'].shape[2:] == (28, 28)
    probs = np.asarray(dets['det_masks'])
    assert ((probs >= 0) & (probs <= 1)).all()

    # host paste
    masks = paste_masks(np.array([[5., 5., 30., 25., 0.9]]),
                        np.ones((1, 28, 28), np.float32) * 0.9, 64, 96)
    assert masks[0].shape == (64, 96)
    assert masks[0][10, 10] == 1 and masks[0][0, 0] == 0


def test_mask_targets_crop():
    from kgdet_tpu.models.mask_head import mask_targets
    # a GT mask that is 1 exactly inside its box -> crop is ~all ones
    gm = np.zeros((1, 1, 16, 24), np.float32)
    gm[0, 0, 2:8, 3:12] = 1.0     # at stride 4: image box (12, 8)-(48, 32)
    props = jnp.asarray([[[12., 8., 47., 31.]]])
    t = mask_targets(jnp.asarray(gm), jnp.zeros((1, 1), jnp.int32), props,
                     mask_stride=4, out_size=8)
    assert float(t.mean()) > 0.85


def test_segm_results_pipeline(tmp_path):
    """4-tuple results (with mask probs) -> segm json -> segm eval."""
    from kgdet_tpu.config import DataConfig
    from kgdet_tpu.data.dataset import DeepFashion2Dataset
    from kgdet_tpu.eval_loop import evaluate_results
    from tests.test_data import make_synth_coco
    tmpdir = str(tmp_path / 'coco')
    import os
    os.makedirs(tmpdir)
    ann = make_synth_coco(tmpdir, n_images=3, landscape_only=True)
    # give GTs rectangular polygon segmentations derived from their boxes
    import json
    data = json.load(open(ann))
    for a in data['annotations']:
        x, y, w, h = a['bbox']
        a['segmentation'] = [[x, y, x + w, y, x + w, y + h, x, y + h]]
    json.dump(data, open(ann, 'w'))
    ds = DeepFashion2Dataset(DataConfig(ann_file=ann, img_prefix=tmpdir),
                             train=False)
    # echo GT boxes as detections with all-ones masks (fill the box)
    results = {}
    for img_id in ds.coco.img_ids:
        anns = ds.coco.anns_for_img(img_id)
        dets = np.array([[a['bbox'][0], a['bbox'][1],
                          a['bbox'][0] + a['bbox'][2],
                          a['bbox'][1] + a['bbox'][3], 0.95]
                         for a in anns], np.float32)
        labels = np.array([ds.cat2label[a['category_id']] - 1
                           for a in anns])
        kpts = np.zeros((len(anns), 3), np.float32)
        masks = np.ones((len(anns), 28, 28), np.float32)
        results[img_id] = (dets, labels, kpts, masks)
    stats, files = evaluate_results(
        results, ds, out_prefix=str(tmp_path / 'res'),
        iou_types=('bbox', 'segm'), verbose=False)
    assert stats['segm']['AP'] > 0.6, stats['segm']
    assert os.path.exists(files['segm'])


def test_ohem_sampler_picks_hard_negatives():
    from kgdet_tpu.core.two_stage_loss import sample_pos_neg
    rng = jax.random.PRNGKey(0)
    pos = jnp.zeros(20, bool)
    neg = jnp.ones(20, bool)
    hardness = jnp.arange(20.0)
    _, neg_sel = sample_pos_neg(rng, pos, neg, 8, 0.25,
                                neg_priority=hardness)
    # quota = 8 - 2 = 6 hardest negatives = indices 14..19
    assert np.asarray(neg_sel).nonzero()[0].tolist() == list(range(14, 20))


def test_faster_rcnn_ohem_train():
    cfg = frcnn_cfg().replace(rcnn_sampler='ohem')
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['seed'] = jnp.int32(11)
    _, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss_cls']))


def test_balanced_quota_mask_spreads_over_groups():
    from kgdet_tpu.core.two_stage_loss import _balanced_quota_mask
    rng = jax.random.PRNGKey(0)
    # 3 groups with 20/20/2 members; quota 12 -> 2-member group fully taken,
    # remainder split over the large groups (5 each)
    mask = jnp.ones(42, bool)
    gid = jnp.asarray([0] * 20 + [1] * 20 + [2] * 2)
    sel = _balanced_quota_mask(rng, mask, gid, 12)
    sel = np.asarray(sel)
    assert sel.sum() == 12
    assert sel[40:].sum() == 2
    assert 4 <= sel[:20].sum() <= 6 and 4 <= sel[20:40].sum() <= 6
    # quota never exceeds the available candidates
    small = jnp.zeros(42, bool).at[:3].set(True)
    sel2 = _balanced_quota_mask(jax.random.PRNGKey(1), small, gid, 12)
    assert np.asarray(sel2).sum() == 3
    assert not np.asarray(sel2 & ~small).any()


@pytest.mark.parametrize('sampler', ['iou_balanced', 'instance_balanced'])
def test_faster_rcnn_balanced_samplers_train(sampler):
    cfg = frcnn_cfg().replace(rcnn_sampler=sampler)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['seed'] = jnp.int32(13)
    _, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss_cls'])), sampler


def test_double_head_rcnn_train_and_predict():
    cfg = frcnn_cfg().replace(detector_type='double_head_rcnn')
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    head = params['bbox_head']
    assert 'res_block' in head and 'conv_branch_0' in head
    assert 'fc_branch_0' in head and 'fc_branch_1' in head
    assert head['fc_reg']['kernel'].shape == (1024, 14 * 4)
    assert head['fc_cls']['kernel'].shape == (1024, 14)

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['seed'] = jnp.int32(17)
    params2, _, logs = step(params, stats, opt_state, batch)
    for k in ('loss_cls', 'loss_bbox'):
        assert np.isfinite(float(logs[k])), k

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()
