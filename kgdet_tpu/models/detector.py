"""Detector composition: backbone -> neck -> head (single-stage, keypointed).

Parity reference: /root/reference/mmdetection/mmdet/models/detectors/
single_stage.py:10-70 and reppoints_detector_kp.py:10-148 (composition only;
loss/postprocess are functional and live in kgdet_tpu.core).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from kgdet_tpu.config import BACKBONES, DETECTORS, HEADS, NECKS, KGDetConfig
from kgdet_tpu.models.fpn import FPN
from kgdet_tpu.models.kgdet_head import KGDetHead
from kgdet_tpu.models.resnet import ResNet
from kgdet_tpu.models.retina_head import RetinaHead
from kgdet_tpu.models.serial_head import SerialKpHead

BACKBONES.register(ResNet)
NECKS.register(FPN)
HEADS.register(KGDetHead)
HEADS.register(SerialKpHead)
HEADS.register(RetinaHead)


@DETECTORS.register
class KGDetDetector(nn.Module):
    """backbone -> FPN(select_out) -> 3-stage keypoint-guided cascade head."""
    cfg: KGDetConfig

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalized. Returns list-of-level head dicts."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32
        backbone_cls = BACKBONES.get(cfg.backbone.type)
        backbone = backbone_cls(
            depth=cfg.backbone.depth, num_stages=cfg.backbone.num_stages,
            out_indices=cfg.backbone.out_indices,
            dcn_stages=cfg.backbone.dcn_stages,
            gcb_stages=cfg.backbone.gcb_stages,
            nonlocal_stages=cfg.backbone.nonlocal_stages,
            gen_attention_stages=cfg.backbone.gen_attention_stages,
            style=cfg.backbone.style, dtype=dtype,
            name='backbone')
        neck_cls = NECKS.get(cfg.neck.type)
        neck = neck_cls(
            in_channels=cfg.neck.in_channels,
            out_channels=cfg.neck.out_channels,
            start_level=cfg.neck.start_level, end_level=cfg.neck.end_level,
            num_outs=cfg.neck.num_outs,
            add_extra_convs=cfg.neck.add_extra_convs,
            select_out=cfg.neck.select_out, norm=cfg.neck.norm,
            gn_groups=cfg.neck.gn_groups, dtype=dtype, name='neck')
        if cfg.head.type == 'RetinaHead':
            head_kwargs = dict(
                num_classes=cfg.head.num_classes,
                in_channels=cfg.head.in_channels,
                feat_channels=cfg.head.feat_channels,
                stacked_convs=cfg.head.stacked_convs,
                octave_base_scale=cfg.head.octave_base_scale,
                scales_per_octave=cfg.head.scales_per_octave,
                anchor_ratios=cfg.head.anchor_ratios,
                anchor_strides=cfg.head.point_strides,
                norm=cfg.head.norm, gn_groups=cfg.head.gn_groups,
                dtype=dtype, name='head')
        else:
            head_kwargs = dict(
                num_classes=cfg.head.num_classes,
                in_channels=cfg.head.in_channels,
                feat_channels=cfg.head.feat_channels,
                point_feat_channels=cfg.head.point_feat_channels,
                stacked_convs=cfg.head.stacked_convs,
                num_keypts=cfg.head.num_keypts,
                gradient_mul=cfg.head.gradient_mul,
                point_strides=cfg.head.point_strides,
                point_base_scale=cfg.head.point_base_scale,
                transform_method=cfg.head.transform_method,
                moment_mul=cfg.head.moment_mul, norm=cfg.head.norm,
                gn_groups=cfg.head.gn_groups, dtype=dtype, name='head')
        if cfg.head.flip_forward and cfg.head.type.startswith('KGDetHead'):
            flip_indices = None
            if cfg.head.num_keypts == 294:
                from kgdet_tpu.data.deepfashion2_meta import \
                    interleaved_flip_indices
                flip_indices = tuple(
                    int(i) for i in interleaved_flip_indices())
            head_kwargs.update(flip_forward=True, flip_indices=flip_indices)
        head_type = cfg.head.type
        if head_type == 'FCOSHead':
            from kgdet_tpu.models.fcos_head import FCOSHead
            HEADS._map.setdefault('FCOSHead', FCOSHead)
            head_cls = FCOSHead
            head_kwargs = dict(
                num_classes=cfg.head.num_classes,
                in_channels=cfg.head.in_channels,
                feat_channels=cfg.head.feat_channels,
                stacked_convs=cfg.head.stacked_convs,
                strides=cfg.head.point_strides, norm=cfg.head.norm,
                gn_groups=cfg.head.gn_groups, dtype=dtype, name='head')
            head = head_cls(**head_kwargs)
            feats = backbone(images)
            pyramid = neck(feats)
            return head(pyramid)
        if head_type == 'GARetinaHead':
            from kgdet_tpu.models.ga_head import GARetinaHead
            HEADS._map.setdefault('GARetinaHead', GARetinaHead)
            head = GARetinaHead(
                num_classes=cfg.head.num_classes,
                in_channels=cfg.neck.out_channels,
                feat_channels=cfg.head.feat_channels,
                stacked_convs=cfg.head.stacked_convs,
                anchor_strides=cfg.head.point_strides,
                norm=cfg.head.norm, gn_groups=cfg.head.gn_groups,
                dtype=dtype, name='head')
            return head(neck(backbone(images)))
        if head_type == 'SSDHead':
            from kgdet_tpu.models.ssd_head import SSDHead
            HEADS._map.setdefault('SSDHead', SSDHead)
            head = SSDHead(
                num_classes=cfg.head.num_classes,
                in_channels=cfg.neck.out_channels,
                anchor_strides=cfg.head.point_strides,
                input_size=cfg.head.ssd_input_size,
                basesize_ratio_range=cfg.head.ssd_basesize_ratio_range,
                anchor_ratios=cfg.head.ssd_anchor_ratios,
                dtype=dtype, name='head')
            return head(neck(backbone(images)))
        if head_type == 'ParallelKpHead':
            head_cls = HEADS.get('SerialKpHead')
            head_kwargs.update(parallel=True, num_reppts=cfg.head.num_reppts)
        elif head_type == 'SerialKpHead':
            head_cls = HEADS.get('SerialKpHead')
            head_kwargs.update(parallel=False, num_reppts=cfg.head.num_reppts)
        elif head_type == 'RepPointsHead':
            # plain upstream RepPoints: no keypoint branch
            head_cls = HEADS.get('SerialKpHead')
            head_kwargs.update(parallel=True, with_keypoints=False,
                               num_reppts=cfg.head.num_reppts)
        elif head_type == 'KGDetHead1Rep':
            # single-column cascade ablation (reference Kp1RepBlock)
            head_cls = HEADS.get('KGDetHead')
            head_kwargs.update(column_taps=(cfg.head.num_reppts,))
        else:
            head_cls = HEADS.get(head_type)
        head = head_cls(**head_kwargs)

        feats = backbone(images)
        pyramid = neck(feats)
        return head(pyramid)
