"""Declarative configuration for kgdet_tpu models and experiments.

Dataclass-based (type-checked, composable) rather than executable python
dicts; a small registry keeps component selection string-driven so config
files stay declarative. Python config files assign a ``config`` variable and
are loaded with ``Config.fromfile`` (UX parity with the reference's
configs/*.py, reference mmdet/utils/registry.py:6-74).
"""
from __future__ import annotations

import dataclasses
import runpy
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


class Registry:
    """String-keyed class registry (build components from config names)."""

    def __init__(self, name):
        self.name = name
        self._map = {}

    def register(self, cls=None, *, name=None):
        def deco(c):
            key = name or c.__name__
            if key in self._map:
                raise KeyError(f'{key} already registered in {self.name}')
            self._map[key] = c
            return c
        return deco(cls) if cls is not None else deco

    def get(self, key):
        if key not in self._map:
            raise KeyError(
                f'{key} not in registry {self.name}; have {list(self._map)}')
        return self._map[key]

    def __contains__(self, key):
        return key in self._map


BACKBONES = Registry('backbones')
NECKS = Registry('necks')
HEADS = Registry('heads')
DETECTORS = Registry('detectors')


@dataclass(frozen=True)
class BackboneConfig:
    type: str = 'ResNet'
    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    # 'pytorch' (stride on 3x3) | 'caffe' (stride on the first 1x1)
    style: str = 'pytorch'
    # optional per-stage extras (0-based stage indices)
    dcn_stages: Tuple[int, ...] = ()
    gcb_stages: Tuple[int, ...] = ()
    nonlocal_stages: Tuple[int, ...] = ()
    gen_attention_stages: Tuple[int, ...] = ()
    # ResNeXt grouped bottlenecks (groups=1 => plain ResNet widths)
    groups: int = 1
    base_width: int = 4
    # SSDVGG: depth selects 16/19; extra feature layers + L2Norm scale
    l2_norm_scale: float = 20.0
    vgg_with_last_pool: bool = False
    vgg_input_size: int = 300        # 300 | 512 (selects the extras program)
    # HRNet branch base width (HRNetV2p-W18/32/40)
    hrnet_width: int = 32


@dataclass(frozen=True)
class NeckConfig:
    type: str = 'FPN'
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    start_level: int = 1
    end_level: int = -1
    num_outs: int = 5
    add_extra_convs: bool = True
    select_out: Optional[Tuple[int, ...]] = (2,)
    norm: Optional[str] = 'gn'
    gn_groups: int = 32
    # BFP (Libra R-CNN) refine knobs, used by neck type 'FPNBFP'
    bfp_refine_level: int = 2
    bfp_refine_type: str = 'non_local'   # 'conv' | 'non_local'


@dataclass(frozen=True)
class HeadConfig:
    type: str = 'KGDetHead'
    num_classes: int = 13            # foreground classes (sigmoid)
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_keypts: int = 294
    num_reppts: int = 83
    gradient_mul: float = 0.1
    point_strides: Tuple[int, ...] = (32,)
    point_base_scale: int = 4
    transform_method: str = 'moment'
    moment_mul: float = 0.01
    norm: Optional[str] = 'gn'
    gn_groups: int = 32
    # per-stage loss weights (cls, bbox, kpt)
    loss_cls_weights: Tuple[float, ...] = (0.5, 0.5, 1.0)
    loss_bbox_weights: Tuple[float, ...] = (0.5, 0.5, 1.0)
    loss_kpt_weights: Tuple[float, ...] = (0.5, 0.5, 1.0)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_beta: float = 1.0 / 9.0
    # horizontal flip-ensembled forward (TTA, reference flip_forward)
    flip_forward: bool = False
    # anchor-based heads (RetinaHead)
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # RPN base anchor scales (two-stage family; reference rpn configs [8])
    anchor_scales: Tuple[float, ...] = (8.0,)
    # SSD head (reference ssd_head.py recipe knobs)
    ssd_input_size: int = 300
    ssd_basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    ssd_anchor_ratios: Tuple[Tuple[int, ...], ...] = \
        ((2,), (2, 3), (2, 3), (2, 3), (2,))
    ssd_neg_pos_ratio: int = 3
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # HTC semantic-fusion branch stuff classes (reference COCO-stuff 183)
    num_stuff_classes: int = 183


@dataclass(frozen=True)
class AssignConfig:
    type: str = 'PointAssigner'
    # PointAssigner
    scale: int = 4
    pos_num: int = 25
    # MaxIoUAssigner (refine-stage assignment for serial/parallel heads)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    # candidates overlapping a crowd region by IoF > thr are excluded from
    # both positives and negatives (<=0 disables; reference
    # max_iou_assigner.py ignore_iof_thr)
    ignore_iof_thr: float = -1.0


@dataclass(frozen=True)
class TestConfig:
    nms_pre: int = 1000
    min_bbox_size: float = 0.0
    score_thr: float = 0.05
    nms_type: str = 'nms'            # 'nms' | 'soft_nms'
    nms_iou_thr: float = 0.5
    soft_nms_sigma: float = 0.5
    soft_nms_min_score: float = 1e-3
    max_per_class: int = 100
    max_per_img: int = 100


@dataclass(frozen=True)
class OptimConfig:
    type: str = 'sgd'
    lr: float = 5e-3
    momentum: float = 0.9
    weight_decay: float = 1e-4
    # mmcv paramwise_options (reference mmdet/apis/train.py:63-134):
    # bias lr/decay multipliers for non-norm biases; decay multiplier for
    # norm-layer params. 1.0 = the plain global setting.
    bias_lr_mult: float = 1.0
    bias_decay_mult: float = 1.0
    norm_decay_mult: float = 1.0
    grad_clip_norm: float = 35.0
    warmup_iters: int = 500
    warmup_ratio: float = 1.0 / 3
    lr_step_epochs: Tuple[int, ...] = (8, 11)
    lr_step_gamma: float = 0.1
    total_epochs: int = 12


@dataclass(frozen=True)
class DataConfig:
    ann_file: str = ''
    img_prefix: str = ''
    img_scale: Tuple[int, int] = (1333, 800)
    size_divisor: int = 32
    # ship images to the device as raw uint8 BGR (4x less transfer) and
    # run BGR->RGB + (x-mean)/std in-graph (ops/image.device_normalize);
    # False reproduces the reference's host-side float32 normalize exactly
    device_normalize: bool = True
    flip_ratio: float = 0.5
    # propagate each semantic keypoint group's visible value to the whole
    # group (reference group_mode; off in all shipped recipes)
    group_mode: bool = False
    # rasterize GT polygons to (max_gts, H/mask_stride, W/mask_stride)
    # mask targets (Mask R-CNN family)
    with_mask: bool = False
    mask_stride: int = 4
    max_gts: int = 32
    # crowd (iscrowd=1) regions ride along as padded ignore boxes
    max_ignore: int = 8
    # stuff-segmentation label maps (HTC semantic branch): directory of
    # per-image PNGs named like the images; emitted at 1/seg_stride
    seg_prefix: str = ''
    seg_stride: int = 8
    # precomputed proposals (Fast R-CNN): .pkl list of per-image (P, 4|5)
    # arrays aligned with the annotation order (reference custom.py
    # proposal_file), padded/truncated to num_proposals per image
    proposal_file: str = ''
    num_proposals: int = 1000
    # extra augmentations (reference extra_aug.py, wired through
    # prepare_train in the reference's order: photometric -> expand -> crop)
    photo_metric_distortion: bool = False
    expand: bool = False
    random_crop: bool = False
    batch_size: int = 8          # global batch
    # two aspect-ratio buckets: landscape / portrait padded canvases
    canvas_hw: Tuple[Tuple[int, int], ...] = ((800, 1344), (1344, 800))


@dataclass(frozen=True)
class KGDetConfig:
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    neck: NeckConfig = field(default_factory=NeckConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    assigner: AssignConfig = field(default_factory=AssignConfig)
    # refine-stage assigner for init/refine heads (serial/parallel)
    refine_assigner: Optional[AssignConfig] = None
    test: TestConfig = field(default_factory=TestConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train_data: DataConfig = field(default_factory=DataConfig)
    val_data: DataConfig = field(default_factory=DataConfig)
    compute_dtype: str = 'float32'   # 'float32' | 'bfloat16'
    # 'single_stage' | 'rpn' | 'faster_rcnn' | 'fast_rcnn' | 'mask_rcnn'
    # | 'ms_rcnn' | 'cascade_rcnn' | 'double_head_rcnn' | 'grid_rcnn' | 'htc'
    detector_type: str = 'single_stage'
    # HTC semantic-fusion branch (fused_semantic_head); needs
    # gt_semantic_seg in the batch (DataConfig.seg_prefix)
    with_semantic: bool = False
    # two-stage proposal network: 'rpn' | 'ga_rpn' (guided anchoring)
    rpn_type: str = 'rpn'
    # two-stage proposal budget (fixed shapes)
    num_proposals_train: int = 512
    num_proposals_test: int = 1000
    # 'random' | 'ohem' | 'iou_balanced' | 'instance_balanced'
    rcnn_sampler: str = 'random'
    # RoI box head flavor: 'convfc' (shared-2FC) | 'res_layer' (C4-style
    # shared ResNet stage-4 + avg-pool head, reference shared_heads/)
    rcnn_head: str = 'convfc'
    work_dir: str = './work_dirs/kgdet'
    seed: int = 0

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def load_config(path: str) -> KGDetConfig:
    """Load a python config file that defines a ``config`` variable."""
    ns = runpy.run_path(path)
    cfg = ns.get('config')
    if not isinstance(cfg, KGDetConfig):
        raise TypeError(f'{path} must define config: KGDetConfig')
    return cfg
