"""Two-stage training losses (RPN + RCNN) and inference decoding.

Parity surface: mmdet anchor_target with RandomSampler for the RPN
(256 anchors, pos fraction 0.5), MaxIoU(0.5/0.5) + RandomSampler(512, 0.25)
for the RCNN stage, CE + smooth-L1 with per-class delta regression
(target stds (0.1, 0.1, 0.2, 0.2)), and the standard per-class softmax
decode at test time.

TPU-first deviation: the random samplers draw a fixed per-role quota
(top-k over random priorities) instead of rebalancing the negative quota by
the realized positive count — sample counts are static under jit; the loss
normalizer uses the realized count, so the gradient scale matches.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from kgdet_tpu.core.bbox_transforms import bbox2delta, delta2bbox
from kgdet_tpu.core.iou_assign import assign_max_iou
from kgdet_tpu.ops.losses import smooth_l1_loss
from kgdet_tpu.ops.nms import multiclass_nms_kp

RCNN_TARGET_STDS = (0.1, 0.1, 0.2, 0.2)

# Cascade R-CNN stage schedule (reference configs/cascade_rcnn_r50_fpn_1x:
# rising assignment IoU, tightening delta stds, decaying stage loss weight)
CASCADE_STAGE_IOUS = (0.5, 0.6, 0.7)
CASCADE_STAGE_STDS = ((0.1, 0.1, 0.2, 0.2),
                      (0.05, 0.05, 0.1, 0.1),
                      (0.033, 0.033, 0.067, 0.067))
CASCADE_STAGE_WEIGHTS = (1.0, 0.5, 0.25)


def _random_quota_mask(rng, mask, quota):
    """Select up to `quota` True entries of `mask` uniformly at random."""
    pri = jnp.where(mask, jax.random.uniform(rng, mask.shape), -1.0)
    if quota >= mask.shape[-1]:
        return mask
    thresh = jax.lax.top_k(pri, quota)[0][..., -1:]
    return mask & (pri >= jnp.maximum(thresh, 0.0))


def _balanced_quota_mask(rng, mask, group_id, quota):
    """Select up to `quota` True entries of `mask`, spreading evenly over
    groups: candidates get a random within-group rank and the globally
    smallest ranks win, so small groups are taken whole and the remainder
    tops up from larger groups — the fixed-shape reformulation of the
    reference's per-group quota + dynamic top-up samplers
    (iou_balanced_neg_sampler.py, instance_balanced_pos_sampler.py).
    """
    P = mask.shape[-1]
    if quota >= P:
        return mask
    k1, k2 = jax.random.split(rng)
    u = jax.random.uniform(k1, (P,))
    big = jnp.float32(2.0)
    sort_key = jnp.where(mask, group_id.astype(jnp.float32) * big + u,
                         jnp.inf)
    order = jnp.argsort(sort_key)
    idx = jnp.arange(P)
    sorted_groups = jnp.where(mask[order], group_id[order], -1)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_groups[1:] != sorted_groups[:-1]])
    start_pos = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, 0))
    rank = jnp.zeros((P,), jnp.int32).at[order].set(
        (idx - start_pos).astype(jnp.int32))
    key = jnp.where(mask, rank + jax.random.uniform(k2, (P,)) * 0.99,
                    jnp.inf)
    thresh = -jax.lax.top_k(-key, quota)[0][..., -1]
    return mask & (key <= thresh)


def sample_pos_neg(rng, pos_mask, neg_mask, num, pos_fraction,
                   neg_priority=None, pos_group_id=None, neg_group_id=None):
    """Pos/neg subsampling with static quotas (see module docstring).

    neg_priority: optional (N,) scores — negatives are taken by descending
    priority instead of uniformly (OHEM, parity: mmdet ohem_sampler.py
    hard-negative mining by classification loss).
    pos_group_id / neg_group_id: optional (N,) int groups — the matching
    role is sampled group-balanced instead of uniformly (instance-balanced
    positives / IoU-bin-balanced negatives).
    """
    num_pos = int(num * pos_fraction)
    num_neg = num - num_pos
    k1, k2 = jax.random.split(rng)
    if pos_group_id is not None:
        pos_sel = _balanced_quota_mask(k1, pos_mask, pos_group_id, num_pos)
    else:
        pos_sel = _random_quota_mask(k1, pos_mask, num_pos)
    if neg_group_id is not None:
        neg_sel = _balanced_quota_mask(k2, neg_mask, neg_group_id, num_neg)
    elif neg_priority is None:
        neg_sel = _random_quota_mask(k2, neg_mask, num_neg)
    else:
        pri = jnp.where(neg_mask, neg_priority, -jnp.inf)
        if num_neg < neg_mask.shape[-1]:
            thresh = jax.lax.top_k(pri, num_neg)[0][..., -1:]
            neg_sel = neg_mask & (pri >= thresh)
        else:
            neg_sel = neg_mask
    return pos_sel, neg_sel


def bce_loss(logits, targets, weights, avg_factor):
    bce = jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return (bce * weights).sum() / jnp.maximum(avg_factor, 1.0)


def _batch_ignore(batch):
    """(gt_bboxes_ignore, gt_ignore_mask) from the batch, or harmless
    zero-region placeholders so vmapped assign signatures stay static."""
    if 'gt_bboxes_ignore' in batch:
        return batch['gt_bboxes_ignore'], batch['gt_ignore_mask']
    B = batch['gt_bboxes'].shape[0]
    return (jnp.zeros((B, 1, 4), jnp.float32), jnp.zeros((B, 1), bool))


def rpn_loss(rpn_outs, anchors_per_level, valids_per_level, batch, rng,
             num_samples=256, pos_fraction=0.5, pos_iou_thr=0.7,
             neg_iou_thr=0.3, min_pos_iou=0.3, ignore_iof_thr=-1.0):
    """Binary objectness + box regression over subsampled anchors."""
    anchors = jnp.concatenate(
        [jnp.asarray(a) for a in anchors_per_level], axis=0)
    valid = jnp.concatenate(list(valids_per_level), axis=1)
    B = valid.shape[0]

    cls = jnp.concatenate(
        [o['cls'][-1].astype(jnp.float32).reshape(B, -1)
         for o in rpn_outs], axis=1)
    reg = jnp.concatenate(
        [o['bbox'][-1].astype(jnp.float32).reshape(B, -1, 4)
         for o in rpn_outs], axis=1)

    def single(key, v, gts, mask, ign, ign_mask):
        a = assign_max_iou(anchors, v, gts, mask, pos_iou_thr, neg_iou_thr,
                           min_pos_iou, gt_bboxes_ignore=ign,
                           gt_ignore_mask=ign_mask,
                           ignore_iof_thr=ignore_iof_thr)
        neg = v & ~a.pos_mask & ~a.ignore_mask
        pos_sel, neg_sel = sample_pos_neg(
            key, a.pos_mask, neg, num_samples, pos_fraction)
        cls_t = pos_sel.astype(jnp.float32)
        cls_w = (pos_sel | neg_sel).astype(jnp.float32)
        deltas = bbox2delta(anchors, gts[a.assigned_gt])
        reg_w = pos_sel.astype(jnp.float32)[:, None]
        return cls_t, cls_w, deltas, reg_w

    keys = jax.random.split(rng, B)
    ign, ign_mask = _batch_ignore(batch)
    cls_t, cls_w, deltas, reg_w = jax.vmap(single)(
        keys, valid, batch['gt_bboxes'], batch['gt_mask'], ign, ign_mask)
    avg = cls_w.sum()
    l_cls = bce_loss(cls, cls_t, cls_w, avg)
    l_reg = smooth_l1_loss(reg, deltas, reg_w, beta=1.0 / 9.0,
                           avg_factor=jnp.maximum(avg, 1.0))
    return l_cls, l_reg


def rcnn_targets_and_loss(proposals, prop_valid, roi_cls, roi_reg, batch,
                          rng, num_classes, num_samples=512,
                          pos_fraction=0.25, pos_iou_thr=0.5,
                          neg_iou_thr=0.5, sampler='random',
                          ignore_iof_thr=-1.0,
                          target_stds=RCNN_TARGET_STDS):
    """RCNN stage: assign proposals, subsample, CE + per-class smooth-L1.

    sampler: 'random' | 'ohem' (hard negatives by background CE loss).
    """
    B, R = proposals.shape[:2]
    roi_cls = roi_cls.astype(jnp.float32)
    roi_reg = roi_reg.astype(jnp.float32).reshape(B, R, -1, 4)
    if sampler == 'ohem':
        # negative hardness = loss of predicting background
        neg_hardness = -jax.nn.log_softmax(
            jax.lax.stop_gradient(roi_cls), axis=-1)[..., 0]
    else:
        neg_hardness = jnp.zeros((B, R))

    def single(key, props, v, gts, labels, mask, hardness, ign, ign_mask):
        a = assign_max_iou(props, v, gts, mask, pos_iou_thr, neg_iou_thr,
                           0.0, gt_bboxes_ignore=ign,
                           gt_ignore_mask=ign_mask,
                           ignore_iof_thr=ignore_iof_thr)
        neg = v & ~a.pos_mask & ~a.ignore_mask
        # negative IoU bins for the IoU-balanced sampler (3 bins over
        # [0, neg_iou_thr), reference iou_balanced_neg_sampler.py)
        neg_bins = jnp.clip(
            (jnp.clip(a.max_iou, 0.0) / max(neg_iou_thr, 1e-6) * 3)
            .astype(jnp.int32), 0, 2)
        pos_sel, neg_sel = sample_pos_neg(
            key, a.pos_mask, neg, num_samples, pos_fraction,
            neg_priority=hardness if sampler == 'ohem' else None,
            pos_group_id=(a.assigned_gt
                          if sampler == 'instance_balanced' else None),
            neg_group_id=neg_bins if sampler == 'iou_balanced' else None)
        lab = jnp.where(pos_sel, labels[a.assigned_gt], 0)   # 0 = background
        cls_w = (pos_sel | neg_sel).astype(jnp.float32)
        deltas = bbox2delta(props, gts[a.assigned_gt], stds=target_stds)
        reg_w = pos_sel.astype(jnp.float32)
        return lab.astype(jnp.int32), cls_w, deltas, reg_w, a.assigned_gt

    keys = jax.random.split(rng, B)
    ign, ign_mask = _batch_ignore(batch)
    labels, cls_w, deltas, reg_w, assigned_gt = jax.vmap(single)(
        keys, proposals, prop_valid, batch['gt_bboxes'],
        batch['gt_labels'], batch['gt_mask'], neg_hardness, ign, ign_mask)

    avg = jnp.maximum(cls_w.sum(), 1.0)
    logp = jax.nn.log_softmax(roi_cls, axis=-1)
    l_cls = -(jnp.take_along_axis(
        logp, labels[..., None], axis=-1)[..., 0] * cls_w).sum() / avg

    # gather the positive class's delta slice: reference layout keeps a
    # background slice at 0, so 1-based label c indexes slice c directly
    cls_idx = jnp.clip(labels, 0, roi_reg.shape[2] - 1)
    reg_sel = jnp.take_along_axis(
        roi_reg, cls_idx[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    l_reg = smooth_l1_loss(reg_sel, deltas, reg_w[..., None],
                           beta=1.0, avg_factor=avg)
    # top-1 classification accuracy over the sampled RoIs, in percent —
    # the reference logs this from the bbox-head loss
    # (mmdet/models/losses/accuracy.py:1-31 via bbox_head.loss 'acc')
    correct = (jnp.argmax(roi_cls, axis=-1) == labels).astype(jnp.float32)
    acc = 100.0 * (correct * cls_w).sum() / avg
    aux = dict(labels=labels, pos_weights=reg_w, assigned_gt=assigned_gt,
               acc=acc)
    return l_cls, l_reg, aux


def faster_rcnn_loss(fwd, batch, rng, cfg, valids_per_level,
                     canvas_hw=None):
    """Total two-stage loss + logs (mask term when the model emits masks).

    With cfg.rpn_type == 'ga_rpn' the RPN terms come from the guided-
    anchoring loss (objectness/reg on guided anchors + loc/shape)."""
    k1, k2 = jax.random.split(rng)
    iof_thr = getattr(cfg.assigner, 'ignore_iof_thr', -1.0)
    if getattr(cfg, 'rpn_type', 'rpn') == 'ga_rpn':
        from kgdet_tpu.core.ga_loss import ga_rpn_loss
        ra = cfg.refine_assigner or cfg.assigner
        rpn_total, rpn_logs = ga_rpn_loss(
            fwd['rpn_outs'], batch, cfg.head, ra, canvas_hw, k1)
    else:
        l_rpn_cls, l_rpn_reg = rpn_loss(
            fwd['rpn_outs'], fwd['anchors'], valids_per_level, batch, k1,
            ignore_iof_thr=iof_thr)
        rpn_total = l_rpn_cls + l_rpn_reg
        rpn_logs = {'loss_rpn_cls': l_rpn_cls, 'loss_rpn_bbox': l_rpn_reg}
    l_cls, l_reg, aux = rcnn_targets_and_loss(
        fwd['proposals'], fwd['proposal_valid'], fwd['roi_cls'],
        fwd['roi_reg'], batch, k2, cfg.head.num_classes,
        sampler=getattr(cfg, 'rcnn_sampler', 'random'),
        ignore_iof_thr=iof_thr)
    total = rpn_total + l_cls + l_reg
    logs = {**rpn_logs, 'loss_cls': l_cls, 'loss_bbox': l_reg,
            'acc': aux['acc']}
    if 'grid_fused' in fwd:
        from kgdet_tpu.models.grid_head import grid_loss, grid_targets
        props = fwd['grid_props']                    # (B, K, 4)
        B, K = props.shape[:2]

        def assign_grid(p, gts, mask):
            a = assign_max_iou(p, jnp.ones((p.shape[0],), bool), gts, mask,
                               0.5, 0.5, 0.0)
            return a.assigned_gt, a.pos_mask

        assigned, posm = jax.vmap(assign_grid)(
            props, batch['gt_bboxes'], batch['gt_mask'])
        gt_sel = jnp.take_along_axis(
            batch['gt_bboxes'], assigned[..., None].repeat(4, -1), axis=1)
        targets, valid_roi = grid_targets(
            props.reshape(-1, 4), gt_sel.reshape(-1, 4))
        wgt = (posm.reshape(-1) & valid_roi).astype(jnp.float32)
        hm = fwd['grid_fused'].shape[2]
        l_grid = grid_loss(
            fwd['grid_fused'].reshape((-1, hm, hm) +
                                      fwd['grid_fused'].shape[4:]),
            fwd['grid_unfused'].reshape((-1, hm, hm) +
                                        fwd['grid_unfused'].shape[4:]),
            targets, wgt)
        total = total + l_grid
        logs['loss_grid'] = l_grid
    if 'mask_logits' in fwd and 'gt_masks' in batch:
        from kgdet_tpu.models.mask_head import mask_loss, mask_targets
        targets = mask_targets(
            batch['gt_masks'].astype(jnp.float32), aux['assigned_gt'],
            fwd['proposals'], cfg.train_data.mask_stride,
            out_size=fwd['mask_logits'].shape[2])
        l_mask = mask_loss(fwd['mask_logits'], targets, aux['labels'],
                           aux['pos_weights'])
        total = total + l_mask
        logs['loss_mask'] = l_mask
        if 'maskiou_pred' in fwd:
            # Mask Scoring R-CNN: MSE(0.5x) on the assigned class's IoU
            # channel for positives with nonzero IoU target
            # (maskiou_head.py loss/get_target)
            from kgdet_tpu.models.mask_head import maskiou_targets
            labels = aux['labels']
            C = fwd['mask_logits'].shape[-1]
            cls_idx = jnp.clip(labels - 1, 0, C - 1)
            logits_cls = jnp.take_along_axis(
                fwd['mask_logits'].astype(jnp.float32),
                cls_idx[..., None, None, None], axis=-1)[..., 0]
            iou_t = maskiou_targets(jax.lax.stop_gradient(logits_cls),
                                    targets)
            pred = jnp.take_along_axis(
                fwd['maskiou_pred'].astype(jnp.float32),
                cls_idx[..., None], axis=-1)[..., 0]
            wgt = aux['pos_weights'] * (iou_t > 0)
            l_iou = 0.5 * ((pred - iou_t) ** 2 * wgt).sum() \
                / jnp.maximum(wgt.sum(), 1.0)
            total = total + l_iou
            logs['loss_mask_iou'] = l_iou
    return total, logs


def two_stage_loss_fn(detector_type: str):
    """Loss entry per cfg.detector_type (forward_train equivalents)."""
    table = {
        'faster_rcnn': faster_rcnn_loss,
        'fast_rcnn': fast_rcnn_loss,
        'mask_rcnn': faster_rcnn_loss,
        'ms_rcnn': faster_rcnn_loss,
        'double_head_rcnn': faster_rcnn_loss,
        'grid_rcnn': faster_rcnn_loss,
        'cascade_rcnn': cascade_rcnn_loss,
        'htc': cascade_rcnn_loss,
        'rpn': rpn_only_loss,
    }
    if detector_type not in table:
        raise KeyError(f'unknown two-stage detector {detector_type}')
    return table[detector_type]


def rpn_only_loss(fwd, batch, rng, cfg, valids_per_level, canvas_hw=None):
    """Standalone RPN detector loss (reference detectors/rpn.py
    forward_train: RPN terms only, proposal quality evaluated by recall)."""
    iof_thr = getattr(cfg.assigner, 'ignore_iof_thr', -1.0)
    l_cls, l_reg = rpn_loss(
        fwd['rpn_outs'], fwd['anchors'], valids_per_level, batch, rng,
        ignore_iof_thr=iof_thr)
    return l_cls + l_reg, {'loss_rpn_cls': l_cls, 'loss_rpn_bbox': l_reg}


def fast_rcnn_loss(fwd, batch, rng, cfg, valids_per_level, canvas_hw=None):
    """Fast R-CNN: RCNN terms only — proposals are precomputed inputs
    (reference detectors/fast_rcnn.py forward_train has no RPN)."""
    iof_thr = getattr(cfg.assigner, 'ignore_iof_thr', -1.0)
    l_cls, l_reg, aux = rcnn_targets_and_loss(
        fwd['proposals'], fwd['proposal_valid'], fwd['roi_cls'],
        fwd['roi_reg'], batch, rng, cfg.head.num_classes,
        sampler=getattr(cfg, 'rcnn_sampler', 'random'),
        ignore_iof_thr=iof_thr)
    return l_cls + l_reg, {'loss_cls': l_cls, 'loss_bbox': l_reg,
                           'acc': aux['acc']}


def cascade_rcnn_loss(fwd, batch, rng, cfg, valids_per_level,
                      canvas_hw=None):
    """RPN loss + per-stage RCNN losses with the cascade IoU/std/weight
    schedule (parity: cascade_rcnn.py forward_train stage loop)."""
    stages = fwd['stages']
    keys = jax.random.split(rng, 1 + len(stages))
    iof_thr = getattr(cfg.assigner, 'ignore_iof_thr', -1.0)
    l_rpn_cls, l_rpn_reg = rpn_loss(
        fwd['rpn_outs'], fwd['anchors'], valids_per_level, batch, keys[0],
        ignore_iof_thr=iof_thr)
    total = l_rpn_cls + l_rpn_reg
    logs = {'loss_rpn_cls': l_rpn_cls, 'loss_rpn_bbox': l_rpn_reg}
    if 'semantic_pred' in fwd and 'gt_semantic_seg' in batch:
        from kgdet_tpu.models.mask_head import semantic_loss
        l_sem = semantic_loss(fwd['semantic_pred'],
                              batch['gt_semantic_seg'])
        total = total + l_sem
        logs['loss_semantic_seg'] = l_sem
    for i, (st, key) in enumerate(zip(stages, keys[1:])):
        iou = CASCADE_STAGE_IOUS[i]
        l_cls, l_reg, st_aux = rcnn_targets_and_loss(
            st['proposals'], fwd['proposal_valid'], st['roi_cls'],
            st['roi_reg'], batch, key, cfg.head.num_classes,
            pos_iou_thr=iou, neg_iou_thr=iou,
            sampler=getattr(cfg, 'rcnn_sampler', 'random'),
            ignore_iof_thr=iof_thr, target_stds=CASCADE_STAGE_STDS[i])
        w = CASCADE_STAGE_WEIGHTS[i]
        total = total + w * (l_cls + l_reg)
        logs[f'loss_cls_s{i}'] = l_cls
        logs[f'loss_bbox_s{i}'] = l_reg
        logs[f'acc_s{i}'] = st_aux['acc']

    # HTC: per-stage mask losses on the shared leading proposals
    if 'mask_logits_stages' in fwd and 'gt_masks' in batch:
        from kgdet_tpu.models.mask_head import mask_loss, mask_targets
        mprops = fwd['mask_props']                     # (B, K, 4)

        def assign_m(p, gts, labels, mask):
            a = assign_max_iou(p, jnp.ones((p.shape[0],), bool), gts, mask,
                               0.5, 0.5, 0.0)
            lab = jnp.where(a.pos_mask, labels[a.assigned_gt], 0)
            return a.assigned_gt, a.pos_mask, lab

        assigned, posm, labels = jax.vmap(assign_m)(
            mprops, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_mask'])
        S = fwd['mask_logits_stages'][0].shape[2]
        targets = mask_targets(
            batch['gt_masks'].astype(jnp.float32), assigned, mprops,
            cfg.train_data.mask_stride, out_size=S)
        posf = posm.astype(jnp.float32)
        for i, ml in enumerate(fwd['mask_logits_stages']):
            l_mask = mask_loss(ml, targets, labels, posf) \
                * CASCADE_STAGE_WEIGHTS[i]
            total = total + l_mask
            logs[f'loss_mask_s{i}'] = l_mask
    return total, logs


def decode_cascade_detections(fwd, img_hw, scale_factor, test_cfg,
                              num_classes):
    """Cascade decode: last-stage class-agnostic boxes, stage-averaged
    per-class scores (parity: cascade_rcnn.py simple_test ms_scores)."""
    stages = fwd['stages']
    valid = fwd['proposal_valid']
    last = stages[-1]
    B, R = last['proposals'].shape[:2]
    scores = sum(jax.nn.softmax(s['roi_cls'].astype(jnp.float32), axis=-1)
                 for s in stages) / len(stages)
    fg_scores = jnp.where(valid[..., None], scores[..., 1:], 0.0)
    boxes = delta2bbox(last['proposals'],
                       last['roi_reg'].astype(jnp.float32),
                       stds=CASCADE_STAGE_STDS[len(stages) - 1])
    w = img_hw[:, 1][:, None]
    h = img_hw[:, 0][:, None]
    boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                       jnp.clip(boxes[..., 1], 0, h),
                       jnp.clip(boxes[..., 2], 0, w),
                       jnp.clip(boxes[..., 3], 0, h)],
                      axis=-1) / scale_factor[:, None, None]

    def nms_one(b, s):
        return multiclass_nms_kp(
            b, s, jnp.zeros((b.shape[0], 3), b.dtype), test_cfg.score_thr,
            test_cfg.nms_iou_thr, max_per_class=test_cfg.max_per_class,
            max_per_img=test_cfg.max_per_img)

    det_bboxes, det_labels, det_kpts, dvalid = jax.vmap(nms_one)(
        boxes, fg_scores)
    return {'det_bboxes': det_bboxes, 'det_labels': det_labels,
            'det_kpts': det_kpts, 'valid': dvalid}


def decode_htc_detections(fwd, img_hw, scale_factor, test_cfg,
                          num_classes):
    """HTC decode: NMS over the top-K last-stage boxes (stage-mean scores),
    carrying each detection's stage-averaged mask probs."""
    boxes = fwd['mask_boxes']
    scores = jnp.where(fwd['mask_valid'][..., None],
                       fwd['mask_scores'], 0.0)
    B, K = boxes.shape[:2]
    w = img_hw[:, 1][:, None]
    h = img_hw[:, 0][:, None]
    boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                       jnp.clip(boxes[..., 1], 0, h),
                       jnp.clip(boxes[..., 2], 0, w),
                       jnp.clip(boxes[..., 3], 0, h)],
                      axis=-1) / scale_factor[:, None, None]
    src = jnp.broadcast_to(
        jnp.arange(K, dtype=boxes.dtype)[None, :, None], (B, K, 1))

    def nms_one(b, s, k):
        return multiclass_nms_kp(
            b, s, k, test_cfg.score_thr, test_cfg.nms_iou_thr,
            max_per_class=test_cfg.max_per_class,
            max_per_img=test_cfg.max_per_img)

    det_bboxes, det_labels, det_src, dvalid = jax.vmap(nms_one)(
        boxes, scores, src)
    M = det_bboxes.shape[1]
    src_idx = jnp.clip(det_src[..., 0].astype(jnp.int32), 0, K - 1)
    ml = fwd['mask_logits'].astype(jnp.float32)       # (B, K, S, S, C)
    per_det = jnp.take_along_axis(
        ml, src_idx[:, :, None, None, None].repeat(
            ml.shape[2], 2).repeat(ml.shape[3], 3), axis=1)
    cls_sel = jnp.take_along_axis(
        per_det, det_labels[:, :, None, None, None], axis=-1)[..., 0]
    return {'det_bboxes': det_bboxes, 'det_labels': det_labels,
            'det_kpts': jnp.zeros((B, M, 3), det_bboxes.dtype),
            'det_masks': jax.nn.sigmoid(cls_sel), 'valid': dvalid}


def decode_grid_detections(fwd, img_hw, scale_factor, test_cfg,
                           num_classes):
    """Grid R-CNN decode: NMS over the grid-refined top-K boxes with their
    per-class scores (grid_rcnn.py simple_test order, fixed shapes)."""
    boxes = fwd['grid_boxes']
    scores = jnp.where(fwd['grid_valid'][..., None],
                       fwd['grid_scores'], 0.0)
    w = img_hw[:, 1][:, None]
    h = img_hw[:, 0][:, None]
    boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                       jnp.clip(boxes[..., 1], 0, h),
                       jnp.clip(boxes[..., 2], 0, w),
                       jnp.clip(boxes[..., 3], 0, h)],
                      axis=-1) / scale_factor[:, None, None]

    def nms_one(b, s):
        return multiclass_nms_kp(
            b, s, jnp.zeros((b.shape[0], 3), b.dtype), test_cfg.score_thr,
            test_cfg.nms_iou_thr, max_per_class=test_cfg.max_per_class,
            max_per_img=test_cfg.max_per_img)

    det_bboxes, det_labels, det_kpts, dvalid = jax.vmap(nms_one)(
        boxes, scores)
    return {'det_bboxes': det_bboxes, 'det_labels': det_labels,
            'det_kpts': det_kpts, 'valid': dvalid}


def decode_rpn_proposals(fwd, img_hw, scale_factor, test_cfg, num_classes):
    """Standalone-RPN decode: score-ranked proposals in original-image
    coords (reference detectors/rpn.py simple_test; recall-eval consumers
    read det_bboxes[..., :4] in rank order)."""
    boxes = fwd['proposals'].astype(jnp.float32)
    scores = fwd['proposal_scores'].astype(jnp.float32)
    valid = fwd['proposal_valid']
    B, R = boxes.shape[:2]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf), axis=1)
    take = lambda t: jnp.take_along_axis(
        t, order.reshape(B, R, *([1] * (t.ndim - 2))), axis=1)
    boxes = take(boxes) / scale_factor[:, None, None]
    scores = jnp.take_along_axis(scores, order, axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)
    det = jnp.concatenate([boxes, scores[..., None]], axis=-1)
    return {'det_bboxes': det,
            'det_labels': jnp.zeros((B, R), jnp.int32),
            'det_kpts': jnp.zeros((B, R, 3), jnp.float32),
            'valid': valid}


def decode_rcnn_detections(fwd, img_hw, scale_factor, test_cfg,
                           num_classes):
    """Per-class softmax decode + NMS over the padded proposal set."""
    proposals = fwd['proposals']
    valid = fwd['proposal_valid']
    B, R = proposals.shape[:2]
    scores = jax.nn.softmax(fwd['roi_cls'].astype(jnp.float32), axis=-1)
    fg_scores = jnp.where(valid[..., None], scores[..., 1:], 0.0)  # (B,R,C)

    # decode every class's box; NMS consumes per-class scores with shared
    # boxes, so pick each proposal's best-class box (mmdet applies NMS on
    # per-class boxes; with shared-box NMS the top-class box is the standard
    # fixed-shape simplification)
    if 'refined_boxes' in fwd:
        boxes = fwd['refined_boxes']
    else:
        reg = fwd['roi_reg'].astype(jnp.float32).reshape(B, R, -1, 4)
        best = jnp.argmax(fg_scores, axis=-1)
        # slice 0 is background: fg class c uses slice c + 1
        reg_best = jnp.take_along_axis(
            reg, (best + 1)[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
        boxes = delta2bbox(proposals, reg_best, stds=RCNN_TARGET_STDS)
    w = img_hw[:, 1][:, None]
    h = img_hw[:, 0][:, None]
    boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                       jnp.clip(boxes[..., 1], 0, h),
                       jnp.clip(boxes[..., 2], 0, w),
                       jnp.clip(boxes[..., 3], 0, h)],
                      axis=-1) / scale_factor[:, None, None]
    # carry each proposal's index through NMS (recovers mask logits per det)
    src = jnp.broadcast_to(
        jnp.arange(R, dtype=boxes.dtype)[None, :, None], (B, R, 1))

    def nms_one(b, s, k):
        return multiclass_nms_kp(
            b, s, k, test_cfg.score_thr, test_cfg.nms_iou_thr,
            max_per_class=test_cfg.max_per_class,
            max_per_img=test_cfg.max_per_img)

    det_bboxes, det_labels, det_src, dvalid = jax.vmap(nms_one)(
        boxes, fg_scores, src)
    M = det_bboxes.shape[1]
    out = {'det_bboxes': det_bboxes, 'det_labels': det_labels,
           'det_kpts': jnp.zeros((B, M, 3), det_bboxes.dtype),
           'valid': dvalid}
    if 'mask_logits' in fwd:
        src_idx = jnp.clip(det_src[..., 0].astype(jnp.int32), 0, R - 1)
        ml = fwd['mask_logits'].astype(jnp.float32)      # (B, R, S, S, C)
        per_det = jnp.take_along_axis(
            ml, src_idx[:, :, None, None, None].repeat(
                ml.shape[2], 2).repeat(ml.shape[3], 3), axis=1)
        cls_sel = jnp.take_along_axis(
            per_det, det_labels[:, :, None, None, None], axis=-1)[..., 0]
        out['det_masks'] = jax.nn.sigmoid(cls_sel)        # (B, M, S, S)
        if 'maskiou_pred' in fwd:
            # Mask Scoring R-CNN: segm score = cls score * predicted mask
            # IoU of the detection's class (mask_scoring_rcnn.py
            # simple_test_mask score rescoring)
            iou_cls = jnp.take_along_axis(
                jnp.take_along_axis(fwd['maskiou_pred'].astype(jnp.float32),
                                    src_idx[..., None].repeat(
                                        fwd['maskiou_pred'].shape[-1], -1),
                                    axis=1),
                det_labels[..., None], axis=-1)[..., 0]
            out['det_mask_scores'] = det_bboxes[..., 4] * \
                jnp.clip(iou_cls, 0.0, 1.0)
    return out
