"""Serial keypoint RepPoints head on DeepFashion2 (init/refine ablation).

Parity reference: /root/reference/configs/
reppoints_moment_serial_r50_fpn_1x-deepfashion2.py (5-level FPN strides
8-128, 9 RepPoints, PointAssigner(pos_num=1) init + MaxIoU(0.5/0.4) refine,
loss weights cls 1.0 / bbox 0.5,1.0 / kpt 2.0,4.0, smooth-L1 beta 0.11).
"""
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, DataConfig, HeadConfig, KGDetConfig,
    NeckConfig, OptimConfig, TestConfig)

_DATA_ROOT = '/data/deepfashion2'

config = KGDetConfig(
    backbone=BackboneConfig(depth=50, frozen_stages=1),
    neck=NeckConfig(
        in_channels=(256, 512, 1024, 2048), out_channels=256,
        start_level=1, num_outs=5, add_extra_convs=True,
        select_out=None, norm='gn', gn_groups=32),
    head=HeadConfig(
        type='SerialKpHead', num_classes=13, num_keypts=294, num_reppts=9,
        point_strides=(8, 16, 32, 64, 128), point_base_scale=4,
        transform_method='moment', norm='gn',
        loss_cls_weights=(1.0,), loss_bbox_weights=(0.5, 1.0),
        loss_kpt_weights=(2.0, 4.0), smooth_l1_beta=0.11),
    assigner=AssignConfig(type='PointAssigner', scale=4, pos_num=1),
    refine_assigner=AssignConfig(
        type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4,
        min_pos_iou=0.0),
    test=TestConfig(nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5,
                    max_per_img=100),
    optim=OptimConfig(lr=5e-3, momentum=0.9, weight_decay=1e-4,
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
    work_dir='./work_dirs/reppoints_moment_serial_r50_fpn_1x_deepfashion2',
)
