"""Per-family dispatch table: build / loss / decode for every head family.

One record per single-stage head family collapses the three historical
if/elif ladders (models/detector.py head construction,
parallel/train.py::compute_loss target+loss dispatch, and
eval_loop.py::make_predict_fns decode dispatch) into a single registry:
adding a detector family means writing one ``HeadFamily`` and registering
it here. Two-stage detectors dispatch on ``cfg.detector_type`` through
``TWO_STAGE_DECODERS`` / ``TWO_STAGE_LOSSES`` in the same spirit.

Parity surface: the reference's registry dispatch
(mmdet/models/builder.py:18-43 + per-head loss/get_bboxes methods); here the
functional loss/decode pairs live next to the module builder instead of on
the module.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class HeadFamily:
    """One single-stage head family.

    build(cfg, dtype) -> flax head module (named 'head').
    loss(outs, grids, valids, batch, cfg, canvas_hw) -> (total, logs).
    make_decode(cfg, canvas) -> decode(outs, img_hw, scale_factor) -> dets.
    """
    build: Callable
    loss: Callable
    make_decode: Callable


HEAD_FAMILIES: Dict[str, HeadFamily] = {}


def register_head_family(name: str, family: HeadFamily):
    if name in HEAD_FAMILIES:
        raise KeyError(f'head family {name} already registered')
    HEAD_FAMILIES[name] = family


def get_head_family(name: str) -> HeadFamily:
    if name not in HEAD_FAMILIES:
        raise KeyError(
            f'unknown head family {name}; have {sorted(HEAD_FAMILIES)}')
    return HEAD_FAMILIES[name]


# --------------------------------------------------------- shared geometry
def _level_grids(cfg, canvas):
    from kgdet_tpu.parallel.train import build_level_geometry
    return build_level_geometry(cfg, canvas)


def _anchor_head(cfg):
    """RetinaHead instance used only for its anchor recipe (no params)."""
    from kgdet_tpu.models.retina_head import RetinaHead
    return RetinaHead(
        num_classes=cfg.head.num_classes,
        octave_base_scale=cfg.head.octave_base_scale,
        scales_per_octave=cfg.head.scales_per_octave,
        anchor_ratios=cfg.head.anchor_ratios,
        anchor_strides=cfg.head.point_strides)


def _ssd_head(cfg, dtype=jnp.float32, name=None):
    from kgdet_tpu.models.ssd_head import SSDHead
    kw = {} if name is None else {'name': name}
    return SSDHead(
        num_classes=cfg.head.num_classes,
        in_channels=cfg.neck.out_channels,
        anchor_strides=cfg.head.point_strides,
        input_size=cfg.head.ssd_input_size,
        basesize_ratio_range=cfg.head.ssd_basesize_ratio_range,
        anchor_ratios=cfg.head.ssd_anchor_ratios, dtype=dtype, **kw)


def _grid_anchor_set(bases, strides, canvas):
    from kgdet_tpu.ops.anchors import grid_anchors
    H, W = canvas
    return [grid_anchors(b, -(-H // s), -(-W // s), s)
            for b, s in zip(bases, strides)]


def _anchor_valid_set(num_anchors_per_level, strides, canvas, valid_hw):
    """(B, P_l) per-level anchor validity masks from padded extents."""
    from kgdet_tpu.ops.anchors import anchor_valid_flags
    H, W = canvas
    outs = []
    for stride, A in zip(strides, num_anchors_per_level):
        fh, fw = -(-H // stride), -(-W // stride)
        vh = jnp.ceil(valid_hw[:, 0] / stride).astype(jnp.int32)
        vw = jnp.ceil(valid_hw[:, 1] / stride).astype(jnp.int32)
        outs.append(jax.vmap(
            lambda a, b, fh=fh, fw=fw, A=A: anchor_valid_flags(
                fh, fw, A, a, b))(vh, vw))
    return outs


def _point_init_targets(grids, valids, batch, cfg):
    from kgdet_tpu.core.targets import point_targets
    return [point_targets(g, v, batch['gt_bboxes'], batch['gt_labels'],
                          batch['gt_kpts'], batch['gt_mask'],
                          scale=cfg.assigner.scale,
                          pos_num=cfg.assigner.pos_num)
            for g, v in zip(grids, valids)]


# ------------------------------------------------------------ KGDet cascade
def _build_kgdet(cfg, dtype, column_taps=None):
    from kgdet_tpu.models.kgdet_head import KGDetHead
    kw = dict(
        num_classes=cfg.head.num_classes, in_channels=cfg.head.in_channels,
        feat_channels=cfg.head.feat_channels,
        point_feat_channels=cfg.head.point_feat_channels,
        stacked_convs=cfg.head.stacked_convs,
        num_keypts=cfg.head.num_keypts, gradient_mul=cfg.head.gradient_mul,
        point_strides=cfg.head.point_strides,
        point_base_scale=cfg.head.point_base_scale,
        transform_method=cfg.head.transform_method,
        moment_mul=cfg.head.moment_mul, norm=cfg.head.norm,
        gn_groups=cfg.head.gn_groups, dtype=dtype, name='head')
    if column_taps is not None:
        kw['column_taps'] = column_taps
    if cfg.head.flip_forward:
        flip_indices = None
        if cfg.head.num_keypts == 294:
            from kgdet_tpu.data.deepfashion2_meta import \
                interleaved_flip_indices
            flip_indices = tuple(int(i) for i in interleaved_flip_indices())
        kw.update(flip_forward=True, flip_indices=flip_indices)
    return KGDetHead(**kw)


def _kgdet_loss(outs, grids, valids, batch, cfg, canvas_hw):
    from kgdet_tpu.core.loss import kgdet_loss
    return kgdet_loss(outs, grids,
                      _point_init_targets(grids, valids, batch, cfg),
                      cfg.head)


def _make_point_decode(cfg, canvas):
    from kgdet_tpu.core.postprocess import decode_detections
    grids = _level_grids(cfg, canvas)

    def decode(outs, img_hw, scale_factor):
        return decode_detections(outs, grids, img_hw, scale_factor,
                                 cfg.test, num_keypts=cfg.head.num_keypts)
    return decode


register_head_family('KGDetHead', HeadFamily(
    build=_build_kgdet, loss=_kgdet_loss, make_decode=_make_point_decode))
register_head_family('KGDetHead1Rep', HeadFamily(
    build=lambda cfg, dtype: _build_kgdet(
        cfg, dtype, column_taps=(cfg.head.num_reppts,)),
    loss=_kgdet_loss, make_decode=_make_point_decode))


# ------------------------------------------------- serial/parallel RepPoints
def _build_serial(cfg, dtype, parallel=False, with_keypoints=True):
    from kgdet_tpu.models.serial_head import SerialKpHead
    return SerialKpHead(
        num_classes=cfg.head.num_classes, in_channels=cfg.head.in_channels,
        feat_channels=cfg.head.feat_channels,
        point_feat_channels=cfg.head.point_feat_channels,
        stacked_convs=cfg.head.stacked_convs,
        num_keypts=cfg.head.num_keypts, num_reppts=cfg.head.num_reppts,
        gradient_mul=cfg.head.gradient_mul,
        point_strides=cfg.head.point_strides,
        point_base_scale=cfg.head.point_base_scale,
        transform_method=cfg.head.transform_method,
        moment_mul=cfg.head.moment_mul, parallel=parallel,
        with_keypoints=with_keypoints, norm=cfg.head.norm,
        gn_groups=cfg.head.gn_groups, dtype=dtype, name='head')


def _serial_loss(outs, grids, valids, batch, cfg, canvas_hw):
    from kgdet_tpu.core.loss import serial_loss
    from kgdet_tpu.core.targets import max_iou_targets
    ra = cfg.refine_assigner
    if ra is None:
        raise ValueError(f'{cfg.head.type} requires cfg.refine_assigner')
    init_targets = _point_init_targets(grids, valids, batch, cfg)
    refine_targets = []
    for o, g, v in zip(outs, grids, valids):
        stride = g[0, 2]
        centers = jnp.concatenate([g[:, :2], g[:, :2]], axis=-1)
        bbox_off = jax.lax.stop_gradient(o['bbox'][0].astype(jnp.float32))
        B = bbox_off.shape[0]
        cand = bbox_off.reshape(B, -1, 4) * stride + centers[None]
        refine_targets.append(max_iou_targets(
            cand, v, batch['gt_bboxes'], batch['gt_labels'],
            batch['gt_kpts'], batch['gt_mask'],
            pos_iou_thr=ra.pos_iou_thr, neg_iou_thr=ra.neg_iou_thr,
            min_pos_iou=ra.min_pos_iou,
            gt_bboxes_ignore=batch.get('gt_bboxes_ignore'),
            gt_ignore_mask=batch.get('gt_ignore_mask'),
            ignore_iof_thr=getattr(ra, 'ignore_iof_thr', -1.0)))
    return serial_loss(outs, grids, init_targets, refine_targets, cfg.head)


register_head_family('SerialKpHead', HeadFamily(
    build=lambda cfg, dtype: _build_serial(cfg, dtype, parallel=False),
    loss=_serial_loss, make_decode=_make_point_decode))
register_head_family('ParallelKpHead', HeadFamily(
    build=lambda cfg, dtype: _build_serial(cfg, dtype, parallel=True),
    loss=_serial_loss, make_decode=_make_point_decode))
register_head_family('RepPointsHead', HeadFamily(
    build=lambda cfg, dtype: _build_serial(
        cfg, dtype, parallel=True, with_keypoints=False),
    loss=_serial_loss, make_decode=_make_point_decode))


# ----------------------------------------------------------------- Retina
def _build_retina(cfg, dtype):
    from kgdet_tpu.models.retina_head import RetinaHead
    return RetinaHead(
        num_classes=cfg.head.num_classes, in_channels=cfg.head.in_channels,
        feat_channels=cfg.head.feat_channels,
        stacked_convs=cfg.head.stacked_convs,
        octave_base_scale=cfg.head.octave_base_scale,
        scales_per_octave=cfg.head.scales_per_octave,
        anchor_ratios=cfg.head.anchor_ratios,
        anchor_strides=cfg.head.point_strides, norm=cfg.head.norm,
        gn_groups=cfg.head.gn_groups, dtype=dtype, name='head')


def _retina_loss(outs, grids, valids, batch, cfg, canvas_hw):
    from kgdet_tpu.core.anchor_loss import retina_loss
    head = _anchor_head(cfg)
    anchors = _grid_anchor_set(head.base_anchors_per_level(),
                               cfg.head.point_strides, canvas_hw)
    avalids = _anchor_valid_set(
        [head.num_anchors] * len(cfg.head.point_strides),
        cfg.head.point_strides, canvas_hw, batch['valid_hw'])
    ra = cfg.refine_assigner or cfg.assigner
    return retina_loss(outs, anchors, avalids, batch, cfg.head, ra)


def _make_retina_decode(cfg, canvas):
    from kgdet_tpu.core.anchor_loss import decode_detections_anchor
    head = _anchor_head(cfg)
    anchors = _grid_anchor_set(head.base_anchors_per_level(),
                               cfg.head.point_strides, canvas)

    def decode(outs, img_hw, scale_factor):
        return decode_detections_anchor(
            outs, anchors, img_hw, scale_factor, cfg.test,
            num_classes=cfg.head.num_classes)
    return decode


register_head_family('RetinaHead', HeadFamily(
    build=_build_retina, loss=_retina_loss,
    make_decode=_make_retina_decode))


# -------------------------------------------------------------------- SSD
def _ssd_loss(outs, grids, valids, batch, cfg, canvas_hw):
    from kgdet_tpu.core.anchor_loss import ssd_loss
    head = _ssd_head(cfg)
    anchors = _grid_anchor_set(head.base_anchors_per_level(),
                               cfg.head.point_strides, canvas_hw)
    avalids = _anchor_valid_set(head.num_anchors_per_level(),
                                cfg.head.point_strides, canvas_hw,
                                batch['valid_hw'])
    ra = cfg.refine_assigner or cfg.assigner
    return ssd_loss(outs, anchors, avalids, batch, cfg.head, ra,
                    neg_pos_ratio=cfg.head.ssd_neg_pos_ratio,
                    target_stds=cfg.head.target_stds)


def _make_ssd_decode(cfg, canvas):
    from kgdet_tpu.core.anchor_loss import decode_detections_ssd
    head = _ssd_head(cfg)
    anchors = _grid_anchor_set(head.base_anchors_per_level(),
                               cfg.head.point_strides, canvas)

    def decode(outs, img_hw, scale_factor):
        return decode_detections_ssd(
            outs, anchors, img_hw, scale_factor, cfg.test,
            num_classes=cfg.head.num_classes,
            target_stds=cfg.head.target_stds)
    return decode


register_head_family('SSDHead', HeadFamily(
    build=lambda cfg, dtype: _ssd_head(cfg, dtype, name='head'),
    loss=_ssd_loss, make_decode=_make_ssd_decode))


# ------------------------------------------------------------------- FCOS
def _build_fcos(cfg, dtype):
    from kgdet_tpu.models.fcos_head import FCOSHead
    return FCOSHead(
        num_classes=cfg.head.num_classes, in_channels=cfg.head.in_channels,
        feat_channels=cfg.head.feat_channels,
        stacked_convs=cfg.head.stacked_convs,
        strides=cfg.head.point_strides, norm=cfg.head.norm,
        gn_groups=cfg.head.gn_groups, dtype=dtype, name='head')


def _fcos_loss(outs, grids, valids, batch, cfg, canvas_hw):
    from kgdet_tpu.core.fcos_loss import fcos_loss
    return fcos_loss(outs, grids, valids, batch, cfg.head)


def _make_fcos_decode(cfg, canvas):
    from kgdet_tpu.core.fcos_loss import decode_detections_fcos
    grids = _level_grids(cfg, canvas)

    def decode(outs, img_hw, scale_factor):
        return decode_detections_fcos(
            outs, grids, img_hw, scale_factor, cfg.test,
            num_classes=cfg.head.num_classes)
    return decode


register_head_family('FCOSHead', HeadFamily(
    build=_build_fcos, loss=_fcos_loss, make_decode=_make_fcos_decode))


# -------------------------------------------------------------- GA-Retina
def _build_ga_retina(cfg, dtype):
    from kgdet_tpu.models.ga_head import GARetinaHead
    return GARetinaHead(
        num_classes=cfg.head.num_classes, in_channels=cfg.neck.out_channels,
        feat_channels=cfg.head.feat_channels,
        stacked_convs=cfg.head.stacked_convs,
        anchor_strides=cfg.head.point_strides, norm=cfg.head.norm,
        gn_groups=cfg.head.gn_groups, dtype=dtype, name='head')


def _ga_retina_loss(outs, grids, valids, batch, cfg, canvas_hw):
    from kgdet_tpu.core.ga_loss import ga_loss
    ra = cfg.refine_assigner or cfg.assigner
    return ga_loss(outs, batch, cfg.head, ra, canvas_hw)


def _make_ga_decode(cfg, canvas):
    from kgdet_tpu.core.ga_loss import decode_detections_ga

    def decode(outs, img_hw, scale_factor):
        return decode_detections_ga(outs, cfg.head, canvas, img_hw,
                                    scale_factor, cfg.test)
    return decode


register_head_family('GARetinaHead', HeadFamily(
    build=_build_ga_retina, loss=_ga_retina_loss,
    make_decode=_make_ga_decode))


# --------------------------------------------------- two-stage family table
def two_stage_decoder(detector_type: str):
    """decode(fwd, img_hw, scale_factor, test_cfg, num_classes) per
    cfg.detector_type (reference simple_test equivalents)."""
    from kgdet_tpu.core import two_stage_loss as tsl
    table = {
        'faster_rcnn': tsl.decode_rcnn_detections,
        'fast_rcnn': tsl.decode_rcnn_detections,
        'mask_rcnn': tsl.decode_rcnn_detections,
        'ms_rcnn': tsl.decode_rcnn_detections,
        'double_head_rcnn': tsl.decode_rcnn_detections,
        'cascade_rcnn': tsl.decode_cascade_detections,
        'grid_rcnn': tsl.decode_grid_detections,
        'htc': tsl.decode_htc_detections,
    }
    if detector_type == 'rpn':
        from kgdet_tpu.core.two_stage_loss import decode_rpn_proposals
        return decode_rpn_proposals
    if detector_type not in table:
        raise KeyError(f'unknown two-stage detector {detector_type}')
    return table[detector_type]


TWO_STAGE_TYPES = ('faster_rcnn', 'fast_rcnn', 'mask_rcnn', 'ms_rcnn',
                   'cascade_rcnn', 'double_head_rcnn', 'grid_rcnn', 'htc',
                   'rpn')


def is_two_stage(detector_type: str) -> bool:
    return detector_type in TWO_STAGE_TYPES
