"""SSD300 with the VGG-16 trunk on DeepFashion2.

The reference ssd300 recipe (configs/pascal_voc/ssd300_voc.py lineage):
SSDVGG backbone with dilated fc6/fc7 + extra layers + conv4_3 L2Norm,
six-level multibox head, 3:1 hard-negative mining.
"""
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, DataConfig, HeadConfig, KGDetConfig,
    NeckConfig, OptimConfig, TestConfig)

_DATA_ROOT = 'data/deepfashion2'

_data = dict(img_scale=(300, 300), max_gts=32, batch_size=32,
             canvas_hw=((300, 300),))

config = KGDetConfig(
    backbone=BackboneConfig(type='SSDVGG', depth=16, vgg_input_size=300,
                            frozen_stages=-1),
    neck=NeckConfig(type='Identity', out_channels=256),
    head=HeadConfig(type='SSDHead', num_classes=13,
                    point_strides=(8, 16, 32, 64, 100, 300),
                    ssd_input_size=300,
                    ssd_basesize_ratio_range=(0.15, 0.9),
                    ssd_anchor_ratios=((2,), (2, 3), (2, 3), (2, 3),
                                       (2,), (2,)),
                    target_stds=(0.1, 0.1, 0.2, 0.2)),
    assigner=AssignConfig(pos_iou_thr=0.5, neg_iou_thr=0.5,
                          min_pos_iou=0.2),
    test=TestConfig(score_thr=0.02, nms_iou_thr=0.45, max_per_img=200),
    optim=OptimConfig(type='sgd', lr=2e-3, warmup_iters=500,
                      lr_step_epochs=(16, 22), total_epochs=24),
    train_data=DataConfig(
        ann_file=f'{_DATA_ROOT}/train_coco.json',
        img_prefix=f'{_DATA_ROOT}/image', flip_ratio=0.5,
        photo_metric_distortion=True, expand=True, random_crop=True,
        **_data),
    val_data=DataConfig(
        ann_file=f'{_DATA_ROOT}/val_coco.json',
        img_prefix=f'{_DATA_ROOT}/image', flip_ratio=0.0, **_data),
    work_dir='./work_dirs/ssd300_vgg16_deepfashion2',
)
