"""Two-stage detection family: RPN head, RoI box head, Faster R-CNN.

Parity surface: the reference's inherited two-stage zoo
(mmdet/models/anchor_heads/rpn_head.py, bbox_heads/convfc_bbox_head.py,
detectors/two_stage.py, roi_extractors/single_level.py). TPU-first design:
proposals are fixed-size padded tensors (top-k + fixed-shape NMS, no dynamic
box counts), RoI features come from the XLA roi_align, and the FPN level for
each RoI is selected by the standard log2 scale rule with a masked gather
instead of per-level python partitioning.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from kgdet_tpu.core.bbox_transforms import delta2bbox
from kgdet_tpu.models.layers import normal_init
from kgdet_tpu.ops.anchors import base_anchors
from kgdet_tpu.ops.nms import greedy_nms, NEG_INF
from kgdet_tpu.ops.roi import roi_align


class RPNHead(nn.Module):
    """Class-agnostic region proposal head (3x3 conv + 1x1 cls/reg)."""
    in_channels: int = 256
    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                       kernel_init=normal_init(0.01), dtype=self.dtype,
                       name='rpn_conv')
        cls = nn.Conv(self.num_anchors, (1, 1),
                      kernel_init=normal_init(0.01), dtype=self.dtype,
                      name='rpn_cls')
        reg = nn.Conv(self.num_anchors * 4, (1, 1),
                      kernel_init=normal_init(0.01), dtype=self.dtype,
                      name='rpn_reg')
        outs = []
        for x in feats:
            t = nn.relu(conv(x))
            outs.append({'cls': jnp.stack([cls(t)]),
                         'bbox': jnp.stack([reg(t)])})
        return outs


def rpn_proposals(rpn_outs, anchors_per_level, img_hw, nms_pre=1000,
                  max_num=1000, nms_thr=0.7, min_bbox_size=0.0):
    """Decode RPN outputs into fixed-size padded proposals.

    Returns (proposals (B, max_num, 4), scores (B, max_num), valid mask).
    """
    B = rpn_outs[0]['cls'].shape[1]
    lvl_boxes, lvl_scores = [], []
    for outs, anchors in zip(rpn_outs, anchors_per_level):
        anchors = jnp.asarray(anchors)
        P = anchors.shape[0]
        scores = jax.nn.sigmoid(
            outs['cls'][-1].astype(jnp.float32).reshape(B, P))
        reg = outs['bbox'][-1].astype(jnp.float32).reshape(B, P, 4)
        anc = jnp.broadcast_to(anchors[None], (B, P, 4))
        k = min(nms_pre, P)
        top_scores, topk = jax.lax.top_k(scores, k)
        take = lambda t: jnp.take_along_axis(t, topk[..., None], axis=1)
        boxes = delta2bbox(take(anc), take(reg))
        w = img_hw[:, 1][:, None]
        h = img_hw[:, 0][:, None]
        boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, w),
                           jnp.clip(boxes[..., 1], 0, h),
                           jnp.clip(boxes[..., 2], 0, w),
                           jnp.clip(boxes[..., 3], 0, h)], axis=-1)
        ok = ((boxes[..., 2] - boxes[..., 0] > min_bbox_size)
              & (boxes[..., 3] - boxes[..., 1] > min_bbox_size))
        lvl_scores.append(jnp.where(ok, top_scores, NEG_INF))
        lvl_boxes.append(boxes)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)

    def one(b, s):
        keep_idx, keep_scores = greedy_nms(b, s, nms_thr, max_num)
        valid = keep_scores > NEG_INF / 2
        safe = jnp.clip(keep_idx, 0, b.shape[0] - 1)
        return (jnp.where(valid[:, None], b[safe], 0),
                jnp.where(valid, keep_scores, 0), valid)

    return jax.vmap(one)(boxes, scores)


def map_rois_to_levels(rois_wh, num_levels, finest_scale=56):
    """FPN level per RoI by sqrt-area (single_level.py map_roi_levels)."""
    scale = jnp.sqrt(jnp.clip(rois_wh[..., 0] * rois_wh[..., 1], 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def extract_roi_feats(feats, strides, proposals, valid, out_size=7,
                      sample_num=2, finest_scale=56):
    """Multi-level RoIAlign: each RoI samples its scale-matched level.

    feats: list of (B, H_l, W_l, C); proposals: (B, R, 4) image coords.
    Returns (B, R, out, out, C).
    """
    B, R = proposals.shape[:2]
    C = feats[0].shape[-1]
    wh = jnp.stack([proposals[..., 2] - proposals[..., 0],
                    proposals[..., 3] - proposals[..., 1]], axis=-1)
    lvl = map_rois_to_levels(wh, len(feats), finest_scale)   # (B, R)

    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, R))
    rois = jnp.concatenate(
        [batch_idx[..., None].astype(proposals.dtype), proposals],
        axis=-1).reshape(B * R, 5)

    out = jnp.zeros((B * R, out_size, out_size, C), feats[0].dtype)
    for li, (feat, stride) in enumerate(zip(feats, strides)):
        f = roi_align(feat, rois, out_size=out_size,
                      spatial_scale=1.0 / stride, sample_num=sample_num)
        mask = (lvl.reshape(-1) == li) & valid.reshape(-1)
        out = jnp.where(mask[:, None, None, None], f, out)
    return out.reshape(B, R, out_size, out_size, C)


class ConvFCBBoxHead(nn.Module):
    """Shared-2FC RoI box head: softmax cls (C+1) + per-class deltas."""
    num_classes: int = 13           # foreground classes
    in_channels: int = 256
    fc_channels: int = 1024
    roi_size: int = 7
    reg_class_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats: (..., roi, roi, C) -> (cls_logits (..., C+1),
        deltas (..., 4*(C+1) or 4)).

        Non-agnostic deltas use the reference layout — (C+1) slices with
        slice 0 = background (convfc_bbox_head.py fc_reg out_dim_reg), so a
        converted torch fc_reg loads without surgery; slice c serves
        1-based foreground label c.
        """
        lead = roi_feats.shape[:-3]
        x = roi_feats.reshape(*lead, -1)
        x = nn.relu(nn.Dense(self.fc_channels,
                             kernel_init=nn.initializers.xavier_uniform(),
                             dtype=self.dtype, name='shared_fc_0')(x))
        x = nn.relu(nn.Dense(self.fc_channels,
                             kernel_init=nn.initializers.xavier_uniform(),
                             dtype=self.dtype, name='shared_fc_1')(x))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal_init(0.01),
                       dtype=self.dtype, name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic \
            else 4 * (self.num_classes + 1)
        reg = nn.Dense(reg_dim, kernel_init=normal_init(0.001),
                       dtype=self.dtype, name='fc_reg')(x)
        return cls, reg


class _BasicResBlock(nn.Module):
    """3x3 + 1x1 residual projection block (double_bbox_head.py:10-70).

    GroupNorm stands in for the reference's BatchNorm: RoI-head BN depends
    on the sampled-proposal batch statistics, which a pure jitted step
    should not carry as mutable state; GN is the standard substitute.
    """
    out_channels: int
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        gn = lambda n: nn.GroupNorm(
            num_groups=min(self.gn_groups, C), dtype=self.dtype, name=n)
        h = nn.relu(gn('gn1')(nn.Conv(
            C, (3, 3), padding='SAME', use_bias=False, dtype=self.dtype,
            name='conv1')(x)))
        h = nn.GroupNorm(num_groups=self.gn_groups, dtype=self.dtype,
                         name='gn2')(nn.Conv(
                             self.out_channels, (1, 1), use_bias=False,
                             dtype=self.dtype, name='conv2')(h))
        idn = nn.GroupNorm(num_groups=self.gn_groups, dtype=self.dtype,
                           name='gn_identity')(nn.Conv(
                               self.out_channels, (1, 1), dtype=self.dtype,
                               name='conv_identity')(x))
        return nn.relu(h + idn)


class _ResBottleneck(nn.Module):
    """1x1-3x3-1x1 bottleneck for the double-head conv branch."""
    planes: int
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        gn = lambda n, g=self.gn_groups: nn.GroupNorm(
            num_groups=g, dtype=self.dtype, name=n)
        h = nn.relu(gn('gn1', min(self.gn_groups, self.planes))(nn.Conv(
            self.planes, (1, 1), use_bias=False, dtype=self.dtype,
            name='conv1')(x)))
        h = nn.relu(gn('gn2', min(self.gn_groups, self.planes))(nn.Conv(
            self.planes, (3, 3), padding='SAME', use_bias=False,
            dtype=self.dtype, name='conv2')(h)))
        h = gn('gn3')(nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype,
                              name='conv3')(h))
        return nn.relu(h + x)


class DoubleConvFCBBoxHead(nn.Module):
    """Double-head RoI box head: conv branch for regression, fc branch for
    classification (reference double_bbox_head.py:73-180 /
    detectors/double_head_rcnn.py)."""
    num_classes: int = 13
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        lead = roi_feats.shape[:-3]
        r, _, C = roi_feats.shape[-3:]
        x = roi_feats.reshape((-1,) + roi_feats.shape[-3:])

        # conv (regression) branch
        xc = _BasicResBlock(self.conv_out_channels, dtype=self.dtype,
                            name='res_block')(x)
        for i in range(self.num_convs):
            xc = _ResBottleneck(self.conv_out_channels // 4,
                                dtype=self.dtype,
                                name=f'conv_branch_{i}')(xc)
        xc = xc.mean(axis=(1, 2))                  # global average pool
        reg_dim = 4 if self.reg_class_agnostic \
            else 4 * (self.num_classes + 1)
        reg = nn.Dense(reg_dim, kernel_init=normal_init(0.001),
                       dtype=self.dtype, name='fc_reg')(xc)

        # fc (classification) branch
        xf = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            xf = nn.relu(nn.Dense(
                self.fc_out_channels,
                kernel_init=nn.initializers.xavier_uniform(),
                dtype=self.dtype, name=f'fc_branch_{i}')(xf))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal_init(0.01),
                       dtype=self.dtype, name='fc_cls')(xf)
        return cls.reshape(lead + (-1,)), reg.reshape(lead + (-1,))


class SharedResLayer(nn.Module):
    """C4-style shared head: ResNet stage-4 bottlenecks over RoI features
    (reference shared_heads/res_layer.py:13-60 — layer4 via make_res_layer,
    BN in eval mode). Param paths mirror torch (shared_head.layer4.<i>.*).
    """
    depth: int = 50
    stride: int = 2
    style: str = 'pytorch'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from kgdet_tpu.models.resnet import ARCH_SETTINGS, Bottleneck
        n_blocks = ARCH_SETTINGS[self.depth][1][3]
        for i in range(n_blocks):
            x = Bottleneck(planes=512, stride=self.stride if i == 0 else 1,
                           downsample=i == 0, style=self.style,
                           dtype=self.dtype, name=f'layer4/{i}')(x)
        return x


class AvgPoolBBoxHead(nn.Module):
    """Plain box head: global average pool + fc_cls / fc_reg (reference
    bbox_heads/bbox_head.py with with_avg_pool=True, no shared fcs)."""
    num_classes: int = 13
    reg_class_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.mean(axis=(1, 2))
        cls = nn.Dense(self.num_classes + 1, kernel_init=normal_init(0.01),
                       dtype=self.dtype, name='fc_cls')(x)
        reg_dim = 4 if self.reg_class_agnostic \
            else 4 * (self.num_classes + 1)
        reg = nn.Dense(reg_dim, kernel_init=normal_init(0.001),
                       dtype=self.dtype, name='fc_reg')(x)
        return cls, reg


class RPNDetector(nn.Module):
    """Standalone RPN: backbone -> neck -> RPN head -> padded proposals.

    Parity surface: reference detectors/rpn.py — forward_train is the RPN
    loss only; simple_test returns score-ranked proposals evaluated by
    AR@N recall (core/evaluation/recall.py) instead of mAP.
    """
    cfg: Any                          # KGDetConfig
    num_proposals_train: int = 512
    num_proposals_test: int = 1000

    @nn.compact
    def __call__(self, images, img_hw=None, train: bool = True):
        from kgdet_tpu.models.detector import (
            build_backbone, build_neck, compute_dtype)
        from kgdet_tpu.ops.anchors import grid_anchors

        if img_hw is None:
            img_hw = jnp.tile(
                jnp.asarray([[images.shape[1], images.shape[2]]],
                            jnp.float32), (images.shape[0], 1))
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        backbone = build_backbone(cfg, dtype)
        neck = build_neck(cfg, dtype)
        scales = list(cfg.head.anchor_scales)
        rpn = RPNHead(in_channels=cfg.neck.out_channels,
                      feat_channels=cfg.neck.out_channels,
                      num_anchors=len(scales) * len(cfg.head.anchor_ratios),
                      dtype=dtype, name='rpn_head')
        feats = backbone(images)
        if neck is not None:
            feats = neck(feats)
        rpn_outs = rpn(feats)
        strides = cfg.head.point_strides
        anchors = [grid_anchors(
            base_anchors(s, scales, cfg.head.anchor_ratios),
            f.shape[1], f.shape[2], s)
            for f, s in zip(feats, strides)]
        n_prop = (self.num_proposals_train if train
                  else self.num_proposals_test)
        proposals, prop_scores, prop_valid = rpn_proposals(
            rpn_outs, anchors, img_hw, max_num=n_prop)
        return dict(rpn_outs=rpn_outs, anchors=anchors,
                    proposals=proposals, proposal_scores=prop_scores,
                    proposal_valid=prop_valid)


class CascadeRCNN(nn.Module):
    """Cascade R-CNN: shared RPN + N RoI box heads with rising IoU regimes.

    Parity surface: reference mmdet/models/detectors/cascade_rcnn.py — each
    stage's class-agnostic deltas refine the previous stage's boxes
    (detached, like the reference's no-grad refine_bboxes), stage targets
    use IoU thresholds 0.5/0.6/0.7 with tightening delta stds, and test-time
    scores average the per-stage softmax at each stage's own rois.
    """
    cfg: Any                         # KGDetConfig
    num_stages: int = 3
    num_proposals_train: int = 512
    num_proposals_test: int = 1000
    # HTC (hybrid task cascade): per-stage mask heads with mask information
    # flow (reference htc.py / htc_mask_head.py)
    with_mask: bool = False
    # HTC semantic-fusion branch: stride-8 stuff segmentation whose
    # embedding is RoI-added to the box/mask features (fused_semantic_head)
    with_semantic: bool = False
    num_mask_train: int = 64
    num_mask_test: int = 128

    @nn.compact
    def __call__(self, images, img_hw=None, train: bool = True):
        from kgdet_tpu.core.two_stage_loss import CASCADE_STAGE_STDS
        from kgdet_tpu.models.detector import (
            build_backbone, build_neck, compute_dtype)
        from kgdet_tpu.ops.anchors import grid_anchors

        if img_hw is None:
            img_hw = jnp.tile(
                jnp.asarray([[images.shape[1], images.shape[2]]],
                            jnp.float32), (images.shape[0], 1))
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        backbone = build_backbone(cfg, dtype)
        neck = build_neck(cfg, dtype)
        scales = list(cfg.head.anchor_scales)
        rpn = RPNHead(in_channels=cfg.neck.out_channels,
                      feat_channels=cfg.neck.out_channels,
                      num_anchors=len(scales) * len(cfg.head.anchor_ratios),
                      dtype=dtype, name='rpn_head')

        feats = backbone(images)
        if neck is not None:
            feats = neck(feats)
        rpn_outs = rpn(feats)
        strides = cfg.head.point_strides
        anchors = [grid_anchors(
            base_anchors(s, scales, cfg.head.anchor_ratios),
            f.shape[1], f.shape[2], s)
            for f, s in zip(feats, strides)]
        n_prop = (self.num_proposals_train if train
                  else self.num_proposals_test)
        proposals, prop_scores, prop_valid = rpn_proposals(
            rpn_outs, anchors, img_hw, max_num=n_prop)
        boxes = jax.lax.stop_gradient(proposals)

        feats_d = [f.astype(dtype) for f in feats]
        semantic_feat = None
        sem_out = {}
        if self.with_semantic:
            from kgdet_tpu.models.mask_head import FusedSemanticHead
            sem_head = FusedSemanticHead(
                num_ins=len(feats_d),
                conv_channels=cfg.neck.out_channels,
                num_classes=getattr(cfg.head, 'num_stuff_classes', 183),
                dtype=dtype, name='semantic_head')
            sem_pred, semantic_feat = sem_head(feats_d)
            sem_out['semantic_pred'] = sem_pred
            sem_stride = strides[1] if len(strides) > 1 else strides[0]

        def add_semantic(roi_feats, rois, valid, out_size):
            """RoI-pool the semantic embedding (fusion-level stride) and
            add it to the task features (htc.py:56-76)."""
            if semantic_feat is None:
                return roi_feats
            B_, R_ = rois.shape[:2]
            batch_idx = jnp.broadcast_to(
                jnp.arange(B_)[:, None], (B_, R_))
            r5 = jnp.concatenate(
                [batch_idx[..., None].astype(rois.dtype), rois],
                axis=-1).reshape(B_ * R_, 5)
            s = roi_align(semantic_feat, r5, out_size=out_size,
                          spatial_scale=1.0 / sem_stride, sample_num=2)
            s = jnp.where(valid.reshape(-1)[:, None, None, None], s, 0)
            return roi_feats + s.reshape(roi_feats.shape)

        w = img_hw[:, 1][:, None]
        h = img_hw[:, 0][:, None]
        stages = []
        for i in range(self.num_stages):
            roi_feats = extract_roi_feats(feats_d, strides, boxes,
                                          prop_valid)
            roi_feats = add_semantic(roi_feats, boxes, prop_valid, 7)
            head = ConvFCBBoxHead(num_classes=cfg.head.num_classes,
                                  in_channels=cfg.neck.out_channels,
                                  reg_class_agnostic=True, dtype=dtype,
                                  name=f'bbox_head_{i}')
            roi_cls, roi_reg = head(roi_feats)
            stages.append(dict(proposals=boxes, roi_cls=roi_cls,
                               roi_reg=roi_reg))
            if i < self.num_stages - 1:
                refined = delta2bbox(boxes,
                                     roi_reg.astype(jnp.float32),
                                     stds=CASCADE_STAGE_STDS[i])
                refined = jnp.stack(
                    [jnp.clip(refined[..., 0], 0, w),
                     jnp.clip(refined[..., 1], 0, h),
                     jnp.clip(refined[..., 2], 0, w),
                     jnp.clip(refined[..., 3], 0, h)], axis=-1)
                boxes = jax.lax.stop_gradient(refined)

        out = dict(rpn_outs=rpn_outs, anchors=anchors,
                   proposals=proposals, proposal_scores=prop_scores,
                   proposal_valid=prop_valid, stages=stages, **sem_out)

        if self.with_mask:
            from kgdet_tpu.models.mask_head import FCNMaskHead
            mask_heads = [FCNMaskHead(num_classes=cfg.head.num_classes,
                                      with_info_flow=i > 0, dtype=dtype,
                                      name=f'mask_head_{i}')
                          for i in range(self.num_stages)]
            B, R = proposals.shape[:2]
            if train:
                K = min(self.num_mask_train, R)
                mprops = proposals[:, :K]
                mvalid = prop_valid[:, :K]
            else:
                # run masks on the top-K last-stage refined boxes (the NMS
                # pool; the reference masks post-NMS dets — fixed shapes)
                scores = sum(jax.nn.softmax(
                    s['roi_cls'].astype(jnp.float32), axis=-1)
                    for s in stages) / len(stages)
                fg = jnp.where(prop_valid[..., None], scores[..., 1:], 0.0)
                last = stages[-1]
                dec = delta2bbox(last['proposals'],
                                 last['roi_reg'].astype(jnp.float32),
                                 stds=CASCADE_STAGE_STDS[len(stages) - 1])
                K = min(self.num_mask_test, R)
                best = jnp.where(prop_valid, fg.max(-1), -1.0)
                _, top_idx = jax.lax.top_k(best, K)
                take = lambda t: jnp.take_along_axis(
                    t, top_idx.reshape(B, K, *([1] * (t.ndim - 2))), axis=1)
                mprops = take(dec)
                mvalid = jnp.take_along_axis(prop_valid, top_idx, axis=1)
                out['mask_boxes'] = mprops
                out['mask_scores'] = take(fg)
                out['mask_valid'] = mvalid
            mprops_sg = jax.lax.stop_gradient(mprops)
            mfeats = extract_roi_feats(
                feats_d, strides, mprops_sg, mvalid, out_size=14)
            mfeats = add_semantic(mfeats, mprops_sg, mvalid, 14)
            flat = mfeats.reshape((B * K,) + mfeats.shape[2:])
            res = None
            stage_logits = []
            for i in range(self.num_stages):
                logits, res = mask_heads[i](flat, res_feat=res,
                                            return_feat=True)
                stage_logits.append(logits)
            S = logits.shape[1]
            if train:
                out['mask_logits_stages'] = [
                    l.reshape(B, K, S, S, -1) for l in stage_logits]
                out['mask_props'] = mprops
            else:
                avg = sum(l.astype(jnp.float32)
                          for l in stage_logits) / len(stage_logits)
                out['mask_logits'] = avg.reshape(B, K, S, S, -1)
        return out


class FasterRCNN(nn.Module):
    """backbone -> FPN -> RPN + RoI box head (joint forward for training).

    __call__ returns (rpn_outs, proposals, roi_cls, roi_reg, proposal_valid);
    proposal generation runs inside the forward so the whole step jits.
    With ``with_mask`` (Mask R-CNN), a 14x14 RoI mask branch runs on the
    sampled proposals at train time and on the refined best-class boxes at
    test time (parity: fcn_mask_head applied to det bboxes).
    With ``with_grid`` (Grid R-CNN), the grid head trains on the leading
    proposals and, at test, refines the top reg-decoded boxes by heatmap
    boundary voting before NMS (the reference refines post-NMS survivors;
    refining a fixed top-K pre-NMS keeps shapes static —
    detectors/grid_rcnn.py:130-200).
    """
    cfg: Any                         # KGDetConfig
    with_mask: bool = False
    # Mask Scoring R-CNN: per-class mask-IoU regressor rescoring masks
    with_maskiou: bool = False
    with_grid: bool = False
    # Fast R-CNN mode: proposals come in as inputs (reference
    # detectors/fast_rcnn.py), no RPN is built
    external_proposals: bool = False
    num_proposals_train: int = 512
    num_proposals_test: int = 1000
    num_grid_train: int = 64
    num_grid_test: int = 128

    @nn.compact
    def __call__(self, images, img_hw=None, train: bool = True,
                 proposals=None, proposals_valid=None):
        if img_hw is None:
            img_hw = jnp.tile(
                jnp.asarray([[images.shape[1], images.shape[2]]],
                            jnp.float32), (images.shape[0], 1))
        from kgdet_tpu.models.detector import (
            build_backbone, build_neck, compute_dtype)
        from kgdet_tpu.ops.anchors import grid_anchors

        cfg = self.cfg
        dtype = compute_dtype(cfg)
        backbone = build_backbone(cfg, dtype)
        neck = build_neck(cfg, dtype)
        scales = list(cfg.head.anchor_scales)
        feats = backbone(images)
        if neck is not None:
            feats = neck(feats)
        strides = cfg.head.point_strides
        n_prop = (self.num_proposals_train if train
                  else self.num_proposals_test)

        if self.external_proposals:
            # Fast R-CNN: no RPN; precomputed proposals ride the batch
            if proposals is None:
                raise ValueError(
                    'fast_rcnn requires proposals inputs (set '
                    'DataConfig.proposal_file)')
            rpn_outs, anchors = None, None
            prop_valid = (proposals_valid if proposals_valid is not None
                          else jnp.ones(proposals.shape[:2], bool))
            prop_scores = prop_valid.astype(jnp.float32)
        elif cfg.rpn_type == 'ga_rpn':
            from kgdet_tpu.models.ga_head import GARPNHead
            rpn = GARPNHead(in_channels=cfg.neck.out_channels,
                            feat_channels=cfg.neck.out_channels,
                            dtype=dtype, name='rpn_head')
            from kgdet_tpu.core.ga_loss import ga_rpn_proposals
            rpn_outs = rpn(feats)
            anchors = None
            canvas = (images.shape[1], images.shape[2])
            proposals, prop_scores, prop_valid = ga_rpn_proposals(
                rpn_outs, cfg.head, canvas, img_hw, max_num=n_prop)
        else:
            rpn = RPNHead(in_channels=cfg.neck.out_channels,
                          feat_channels=cfg.neck.out_channels,
                          num_anchors=len(scales) *
                          len(cfg.head.anchor_ratios),
                          dtype=dtype, name='rpn_head')
            rpn_outs = rpn(feats)
            anchors = [grid_anchors(
                base_anchors(s, scales, cfg.head.anchor_ratios),
                f.shape[1], f.shape[2], s)
                for f, s in zip(feats, strides)]
            proposals, prop_scores, prop_valid = rpn_proposals(
                rpn_outs, anchors, img_hw, max_num=n_prop)
        proposals = jax.lax.stop_gradient(proposals)

        rcnn_head = getattr(cfg, 'rcnn_head', 'convfc')
        if cfg.detector_type == 'double_head_rcnn':
            bbox_head = DoubleConvFCBBoxHead(
                num_classes=cfg.head.num_classes, dtype=dtype,
                name='bbox_head')
            roi_size = 7
        elif rcnn_head == 'res_layer':
            shared = SharedResLayer(depth=cfg.backbone.depth,
                                    style=cfg.backbone.style, dtype=dtype,
                                    name='shared_head')
            avg_head = AvgPoolBBoxHead(num_classes=cfg.head.num_classes,
                                       dtype=dtype, name='bbox_head')

            def bbox_head(rf):
                lead = rf.shape[:-3]
                flat = rf.reshape((-1,) + rf.shape[-3:])
                cls, reg = avg_head(shared(flat))
                return (cls.reshape(lead + (-1,)),
                        reg.reshape(lead + (-1,)))
            roi_size = 14
        else:
            bbox_head = ConvFCBBoxHead(num_classes=cfg.head.num_classes,
                                       in_channels=cfg.neck.out_channels,
                                       dtype=dtype, name='bbox_head')
            roi_size = 7

        feats_d = [f.astype(dtype) for f in feats]
        roi_feats = extract_roi_feats(feats_d, strides, proposals,
                                      prop_valid, out_size=roi_size)
        roi_cls, roi_reg = bbox_head(roi_feats)
        out = dict(rpn_outs=rpn_outs, anchors=anchors, proposals=proposals,
                   proposal_scores=prop_scores, proposal_valid=prop_valid,
                   roi_cls=roi_cls, roi_reg=roi_reg)

        if self.with_grid:
            from kgdet_tpu.core.two_stage_loss import RCNN_TARGET_STDS
            from kgdet_tpu.models.grid_head import (
                GridHead, grid_refine_boxes)
            grid_head = GridHead(dtype=dtype, name='grid_head')
            B, R = proposals.shape[:2]
            if train:
                K = min(self.num_grid_train, R)
                props = proposals[:, :K]
                gfeats = extract_roi_feats(
                    feats_d, strides, props, prop_valid[:, :K], out_size=14)
                fused, unfused = grid_head(
                    gfeats.reshape((B * K,) + gfeats.shape[2:]), train=True)
                hm = fused.shape[1]
                out['grid_fused'] = fused.reshape(B, K, hm, hm, -1)
                out['grid_unfused'] = unfused.reshape(B, K, hm, hm, -1)
                out['grid_props'] = props
            else:
                fg = jax.nn.softmax(
                    roi_cls.astype(jnp.float32), axis=-1)[..., 1:]
                best_score = jnp.where(prop_valid, fg.max(-1), -1.0)
                K = min(self.num_grid_test, R)
                _, top_idx = jax.lax.top_k(best_score, K)
                take = lambda t: jnp.take_along_axis(
                    t, top_idx.reshape(B, K, *([1] * (t.ndim - 2))), axis=1)
                props = take(proposals)
                best = jnp.argmax(take(fg), axis=-1)
                reg = take(roi_reg.astype(jnp.float32)).reshape(B, K, -1, 4)
                reg_best = jnp.take_along_axis(
                    reg, (best + 1)[..., None, None].repeat(4, -1),
                    axis=2)[:, :, 0]
                refined = delta2bbox(props, reg_best,
                                     stds=RCNN_TARGET_STDS)
                valid_k = jnp.take_along_axis(prop_valid, top_idx, axis=1)
                gfeats = extract_roi_feats(
                    feats_d, strides, jax.lax.stop_gradient(refined),
                    valid_k, out_size=14)
                heat, _ = grid_head(
                    gfeats.reshape((B * K,) + gfeats.shape[2:]),
                    train=False)
                hm = heat.shape[1]
                grid_boxes = jax.vmap(grid_refine_boxes)(
                    heat.reshape(B, K, hm, hm, -1), refined)
                out['grid_boxes'] = grid_boxes
                out['grid_scores'] = take(fg)
                out['grid_valid'] = valid_k

        if self.with_mask:
            from kgdet_tpu.core.two_stage_loss import RCNN_TARGET_STDS
            from kgdet_tpu.models.mask_head import FCNMaskHead
            mask_head = FCNMaskHead(num_classes=cfg.head.num_classes,
                                    in_channels=cfg.neck.out_channels,
                                    dtype=dtype, name='mask_head')
            if train:
                mask_boxes = proposals
            else:
                # refined best-class boxes (what NMS will consume)
                B, R = proposals.shape[:2]
                fg = jax.nn.softmax(
                    roi_cls.astype(jnp.float32), axis=-1)[..., 1:]
                best = jnp.argmax(fg, axis=-1)
                reg = roi_reg.astype(jnp.float32).reshape(B, R, -1, 4)
                # slice 0 is background: fg class c uses slice c + 1
                reg_best = jnp.take_along_axis(
                    reg, (best + 1)[..., None, None].repeat(4, -1),
                    axis=2)[:, :, 0]
                mask_boxes = delta2bbox(proposals, reg_best,
                                        stds=RCNN_TARGET_STDS)
                out['refined_boxes'] = mask_boxes
            mask_feats = extract_roi_feats(
                feats_d, strides, jax.lax.stop_gradient(mask_boxes),
                prop_valid, out_size=14)
            mask_logits = mask_head(mask_feats)         # (B, R, 28, 28, C)
            out['mask_logits'] = mask_logits
            if self.with_maskiou:
                from kgdet_tpu.models.mask_head import MaskIoUHead
                iou_head = MaskIoUHead(num_classes=cfg.head.num_classes,
                                       dtype=dtype, name='mask_iou_head')
                fg = jax.nn.softmax(
                    roi_cls.astype(jnp.float32), axis=-1)[..., 1:]
                best = jnp.argmax(fg, axis=-1)          # (B, R) 0-based
                best_mask = jnp.take_along_axis(
                    mask_logits,
                    best[..., None, None, None], axis=-1)[..., 0]
                out['maskiou_pred'] = iou_head(mask_feats, best_mask)
        return out
