"""Round-3 family tail: standalone RPN (+AR recall), Fast R-CNN, C4
ResLayer head, Mask Scoring R-CNN, and the HTC semantic branch."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import DataConfig
from kgdet_tpu.eval.recall import bbox_overlaps_np, eval_recalls
from kgdet_tpu.eval_loop import make_predict_fns
from kgdet_tpu.parallel.train import make_optimizer, make_train_step
from tests.common import TINY_CANVAS, synth_batch
from tests.test_two_stage import frcnn_cfg

CANVAS = TINY_CANVAS


# ------------------------------------------------------------------ recall
def test_eval_recalls_matches_hand_oracle():
    """Greedy pairing semantics of the reference recall protocol
    (core/evaluation/recall.py:7-37): each round pairs the globally best
    remaining (gt, proposal) IoU."""
    gts = [np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)]
    props = [np.array([
        [0, 0, 10, 10, 0.9],      # exact match of gt0
        [21, 21, 30, 30, 0.8],    # high-IoU match of gt1
        [50, 50, 60, 60, 0.7],    # background
    ], np.float32)]
    r = eval_recalls(gts, props, proposal_nums=(1, 3), iou_thrs=(0.5, 0.95))
    # top-1 proposals: only gt0 matched at 0.5 and 0.95
    assert r[0, 0] == pytest.approx(0.5)
    assert r[0, 1] == pytest.approx(0.5)
    # top-3: both matched at 0.5; only the exact one at 0.95
    assert r[1, 0] == pytest.approx(1.0)
    assert r[1, 1] == pytest.approx(0.5)

    # one proposal overlapping two gts is consumed by the better one
    gts2 = [np.array([[0, 0, 10, 10], [0, 0, 12, 12]], np.float32)]
    props2 = [np.array([[0, 0, 10, 10]], np.float32)]
    r2 = eval_recalls(gts2, props2, proposal_nums=(1,), iou_thrs=(0.9,))
    assert r2[0, 0] == pytest.approx(0.5)


def test_bbox_overlaps_np_basic():
    # legacy inclusive (+1) areas, matching the reference recall
    # protocol's bbox_overlaps and eval/mean_ap.py
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    ious = bbox_overlaps_np(a, b)
    assert ious[0, 0] == pytest.approx(1.0)
    assert ious[0, 1] == pytest.approx(36.0 / 206.0)  # inter 6^2, 121+121-36
    assert ious[0, 2] == 0.0


# ------------------------------------------------------------ RPN detector
def test_rpn_detector_train_predict_and_recall():
    cfg = frcnn_cfg().replace(detector_type='rpn')
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    assert 'rpn_head' in params and 'bbox_head' not in params

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    params2, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss_rpn_cls']))
    assert np.isfinite(float(logs['loss_rpn_bbox']))
    assert 'loss_cls' not in logs        # RPN-only loss surface

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    # score-ranked (x1, y1, x2, y2, score) proposals
    assert dets['det_bboxes'].shape[-1] == 5
    scores = np.asarray(dets['det_bboxes'][..., 4])
    valid = np.asarray(dets['valid'])
    s0 = scores[0][valid[0]]
    assert (np.diff(s0) <= 1e-6).all()

    # proposals feed the recall metric end to end
    res = {1: (np.asarray(dets['det_bboxes'][0][valid[0]]), None, None)}

    class _DS:
        class coco:
            img_to_anns = {1: [{'bbox': [5, 5, 20, 20], 'iscrowd': 0}]}
    from kgdet_tpu.eval.recall import eval_proposal_recall
    stats_out = eval_proposal_recall(res, _DS, proposal_nums=(10, 50),
                                     verbose=False)
    assert 0.0 <= stats_out['AR@10'] <= 1.0


# -------------------------------------------------------------- Fast R-CNN
def test_fast_rcnn_train_and_predict_with_external_proposals():
    cfg = frcnn_cfg().replace(detector_type='fast_rcnn')
    model = build_model(cfg)
    B, R = 2, 64
    rng = np.random.RandomState(0)
    props = np.zeros((B, R, 4), np.float32)
    props[..., :2] = rng.uniform(0, 40, (B, R, 2))
    props[..., 2:] = props[..., :2] + rng.uniform(8, 30, (B, R, 2))
    pvalid = np.ones((B, R), bool)
    pvalid[:, -5:] = False

    x = jnp.zeros((B, CANVAS[0], CANVAS[1], 3))
    variables = jax.jit(lambda r: model.init(
        r, x, train=True, proposals=jnp.asarray(props),
        proposals_valid=jnp.asarray(pvalid)))(jax.random.PRNGKey(0))
    params, stats = variables['params'], variables['batch_stats']
    assert 'rpn_head' not in params      # no RPN in Fast R-CNN

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    batch['proposals'] = jnp.asarray(props)
    batch['proposals_valid'] = jnp.asarray(pvalid)
    params2, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss_cls']))
    assert np.isfinite(float(logs['loss_bbox']))
    assert 'loss_rpn_cls' not in logs

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict({'params': params2, 'batch_stats': stats}, {
        'image': x,
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
        'proposals': jnp.asarray(props),
        'proposals_valid': jnp.asarray(pvalid),
    })
    assert np.isfinite(np.asarray(dets['det_bboxes'])).all()


def test_proposal_file_data_pipeline(tmp_path):
    """DataConfig.proposal_file loads, scales, and pads proposals."""
    import pickle

    from kgdet_tpu.data.dataset import DeepFashion2Dataset
    from tests.test_data import make_synth_coco
    tmpdir = str(tmp_path)
    ann = make_synth_coco(tmpdir, n_images=2, landscape_only=True)
    props = [np.array([[1., 2., 30., 40., 0.9], [0., 0., 10., 10., 0.5]],
                      np.float32),
             np.array([[3., 3., 20., 20.]], np.float32)]
    pfile = f'{tmpdir}/props.pkl'
    with open(pfile, 'wb') as f:
        pickle.dump(props, f)
    cfg = DataConfig(ann_file=ann, img_prefix=tmpdir,
                     img_scale=(96, 64), max_gts=4,
                     canvas_hw=((64, 96),), proposal_file=pfile,
                     num_proposals=8)
    ds = DeepFashion2Dataset(cfg, train=True)
    s = ds.prepare_train(0, np.random.RandomState(0))
    assert s['proposals'].shape == (8, 4)
    assert s['proposals_valid'].sum() == 2
    t = ds.prepare_test(0)
    assert t['proposals'].shape == (8, 4)


def test_proposal_file_dict_form(tmp_path):
    """Dict-keyed proposal files with plain-list 5-column entries keep
    their score column (regression: list entries were reshaped (-1, 4),
    scrambling scores into coordinates); missing keys raise clearly."""
    import pickle

    import pytest

    from kgdet_tpu.data.dataset import DeepFashion2Dataset
    from tests.test_data import make_synth_coco
    tmpdir = str(tmp_path)
    ann = make_synth_coco(tmpdir, n_images=2, landscape_only=True)
    raw = {'img_000.jpg': [[1.0, 2.0, 30.0, 40.0, 0.9],
                           [0.0, 0.0, 10.0, 10.0, 0.5]],
           'img_001.jpg': [[3.0, 3.0, 20.0, 20.0, 0.7]]}
    pfile = f'{tmpdir}/props_dict.pkl'
    with open(pfile, 'wb') as f:
        pickle.dump(raw, f)
    cfg = DataConfig(ann_file=ann, img_prefix=tmpdir,
                     img_scale=(96, 64), max_gts=4,
                     canvas_hw=((64, 96),), proposal_file=pfile,
                     num_proposals=8)
    ds = DeepFashion2Dataset(cfg, train=True)
    assert ds.proposals[1].shape == (2, 5)
    np.testing.assert_allclose(ds.proposals[1][:, 4], [0.9, 0.5])
    s = ds.prepare_test(0)
    assert s['proposals_valid'].sum() == 2

    raw.pop('img_001.jpg')
    with open(pfile, 'wb') as f:
        pickle.dump(raw, f)
    with pytest.raises(KeyError, match='img_001.jpg'):
        DeepFashion2Dataset(cfg, train=True)


# ---------------------------------------------------------------- ResLayer
def test_res_layer_shared_head_train():
    cfg = frcnn_cfg().replace(rcnn_head='res_layer')
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    assert 'shared_head' in params
    assert 'layer4/0' in params['shared_head']
    assert 'fc_cls' in params['bbox_head']

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    params2, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss_cls']))
    # shared-head params actually receive gradient updates
    w0 = np.asarray(
        variables['params']['shared_head']['layer4/0']['conv1']['kernel'])
    w1 = np.asarray(params2['shared_head']['layer4/0']['conv1']['kernel'])
    assert not np.allclose(w0, w1)


# ------------------------------------------------------ Mask Scoring R-CNN
def test_ms_rcnn_train_and_mask_rescoring():
    cfg = frcnn_cfg().replace(
        detector_type='ms_rcnn',
        train_data=DataConfig(with_mask=True, mask_stride=4, max_gts=4))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    assert 'mask_iou_head' in params

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
    assert np.isfinite(float(logs['loss_mask_iou']))

    predict = make_predict_fns(model, cfg, [CANVAS])[tuple(CANVAS)]
    dets = predict(variables, {
        'image': jnp.zeros((2, CANVAS[0], CANVAS[1], 3)),
        'img_hw': jnp.asarray([[60., 90.], [64., 96.]]),
        'scale_factor': jnp.asarray([1.0, 1.0]),
    })
    assert 'det_mask_scores' in dets
    ms = np.asarray(dets['det_mask_scores'])
    box_scores = np.asarray(dets['det_bboxes'][..., 4])
    # rescoring multiplies by a [0, 1] IoU: never above the box score
    assert (ms <= box_scores + 1e-5).all()


def test_maskiou_targets_oracle():
    from kgdet_tpu.models.mask_head import maskiou_targets
    pred = np.full((1, 1, 4, 4), -10.0, np.float32)
    pred[0, 0, :2] = 10.0                # top half predicted
    tgt = np.zeros((1, 1, 4, 4), np.float32)
    tgt[0, 0, 1:3] = 1.0                 # middle half GT
    iou = maskiou_targets(jnp.asarray(pred), jnp.asarray(tgt))
    # inter = 4 px (row 1), union = 8 + 8 - 4 = 12
    assert float(iou[0, 0]) == pytest.approx(4.0 / 12.0)


# --------------------------------------------------------- HTC w/ semantic
def test_htc_semantic_branch_train():
    cfg = frcnn_cfg().replace(
        detector_type='htc', with_semantic=True,
        head=dataclasses.replace(frcnn_cfg().head, num_stuff_classes=8),
        train_data=DataConfig(with_mask=True, mask_stride=4, max_gts=4,
                              seg_stride=16))
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    params, stats = variables['params'], variables['batch_stats']
    assert 'semantic_head' in params

    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, CANVAS, tx))
    batch = jax.tree.map(jnp.asarray, synth_batch())
    rng = np.random.RandomState(0)
    batch['gt_masks'] = jnp.asarray(
        (rng.rand(2, 4, CANVAS[0] // 4, CANVAS[1] // 4) > 0.5)
        .astype(np.float32))
    # stuff map at the semantic head's fusion-level stride (level 1 of the
    # tiny 8/16/32 pyramid = stride 16)
    hs, ws = CANVAS[0] // 16, CANVAS[1] // 16
    seg = rng.randint(0, 8, (2, hs, ws)).astype(np.int32)
    seg[:, -1] = 255                     # ignore strip
    batch['gt_semantic_seg'] = jnp.asarray(seg)
    batch['seed'] = jnp.int32(3)
    params2, _, logs = step(params, stats, opt_state, batch)
    assert np.isfinite(float(logs['loss_semantic_seg']))
    assert float(logs['loss_semantic_seg']) > 0
    # semantic branch params train (first-step SGD updates are ~1e-8 under
    # warmup, so require any change rather than allclose failure)
    w0 = np.asarray(
        variables['params']['semantic_head']['conv_logits']['kernel'])
    w1 = np.asarray(params2['semantic_head']['conv_logits']['kernel'])
    assert not np.array_equal(w0, w1)


def test_semantic_loss_ignores_255():
    from kgdet_tpu.models.mask_head import semantic_loss
    logits = jnp.zeros((1, 2, 2, 4))
    seg = jnp.asarray([[[0, 255], [255, 255]]], jnp.int32)
    l_all = semantic_loss(logits, seg, loss_weight=1.0)
    # CE of uniform logits over 4 classes = log(4), averaged over the one
    # valid pixel only
    assert float(l_all) == pytest.approx(float(np.log(4.0)), rel=1e-5)
