"""Faster R-CNN R-50 FPN baseline on DeepFashion2 (boxes only).

Zoo-parity config for the two-stage family (reference zoo member; see
mmdetection/configs upstream recipes). Keypoints are not predicted by this
detector — evaluation is bbox-only.
"""
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, DataConfig, HeadConfig, KGDetConfig,
    NeckConfig, OptimConfig, TestConfig)

_DATA_ROOT = '/data/deepfashion2'

config = KGDetConfig(
    detector_type='faster_rcnn',
    backbone=BackboneConfig(depth=50, frozen_stages=1),
    neck=NeckConfig(
        in_channels=(256, 512, 1024, 2048), out_channels=256,
        start_level=0, num_outs=5, add_extra_convs=False,
        select_out=None, norm=None),
    head=HeadConfig(num_classes=13, point_strides=(4, 8, 16, 32, 64),
                    anchor_ratios=(0.5, 1.0, 2.0)),
    test=TestConfig(nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5,
                    max_per_img=100),
    optim=OptimConfig(lr=2e-2 / 8, momentum=0.9, weight_decay=1e-4,
                      grad_clip_norm=35.0, warmup_iters=500,
                      lr_step_epochs=(8, 11), total_epochs=12),
    train_data=DataConfig(
        ann_file=f'{_DATA_ROOT}/train-coco_style.json',
        img_prefix=f'{_DATA_ROOT}/train/image',
        img_scale=(1333, 800), flip_ratio=0.5, max_gts=32, batch_size=8,
        canvas_hw=((800, 1344), (1344, 800))),
    val_data=DataConfig(
        ann_file=f'{_DATA_ROOT}/validation-coco_style.json',
        img_prefix=f'{_DATA_ROOT}/validation/image',
        img_scale=(1333, 800), flip_ratio=0.0, batch_size=8,
        canvas_hw=((800, 1344), (1344, 800))),
    compute_dtype='bfloat16',
    work_dir='./work_dirs/faster_rcnn_r50_fpn_1x_deepfashion2',
)
