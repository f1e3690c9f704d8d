"""Libra R-CNN R-50 FPN 1x on DeepFashion2.

Faster R-CNN with the balanced components: BFP neck refine (non-local) and
the IoU-balanced negative sampler (reference necks/bfp.py +
iou_balanced_neg_sampler.py).
"""
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, DataConfig, HeadConfig, KGDetConfig,
    NeckConfig, OptimConfig, TestConfig)

_DATA_ROOT = 'data/deepfashion2'

_data = dict(img_scale=(1333, 800), max_gts=32, batch_size=8,
             canvas_hw=((800, 1344), (1344, 800)))

config = KGDetConfig(
    detector_type='faster_rcnn',
    rcnn_sampler='iou_balanced',
    backbone=BackboneConfig(depth=50, frozen_stages=1),
    neck=NeckConfig(
        type='FPNBFP', in_channels=(256, 512, 1024, 2048),
        out_channels=256, start_level=0, num_outs=5,
        add_extra_convs=False, select_out=None, norm=None,
        bfp_refine_level=2, bfp_refine_type='non_local'),
    head=HeadConfig(num_classes=13, point_strides=(4, 8, 16, 32, 64),
                    anchor_ratios=(0.5, 1.0, 2.0)),
    assigner=AssignConfig(type='MaxIoUAssigner'),
    test=TestConfig(score_thr=0.05, nms_iou_thr=0.5, max_per_img=100),
    optim=OptimConfig(type='sgd', lr=2e-2 / 8, warmup_iters=500,
                      lr_step_epochs=(8, 11), total_epochs=12),
    train_data=DataConfig(
        ann_file=f'{_DATA_ROOT}/train_coco.json',
        img_prefix=f'{_DATA_ROOT}/image', flip_ratio=0.5, **_data),
    val_data=DataConfig(
        ann_file=f'{_DATA_ROOT}/val_coco.json',
        img_prefix=f'{_DATA_ROOT}/image', flip_ratio=0.0, **_data),
    work_dir='./work_dirs/libra_faster_rcnn_r50_fpn_1x_deepfashion2',
)
