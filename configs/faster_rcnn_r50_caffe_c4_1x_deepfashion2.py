"""Faster R-CNN R-50-C4 (caffe) 1x on DeepFashion2.

C4 recipe (reference configs/fast_rcnn_r50_caffe_c4 lineage +
shared_heads/res_layer.py): conv4 backbone features only, no FPN, RoI
features run through the shared ResNet stage-5 (layer4) then an
average-pool box head.
"""
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, DataConfig, HeadConfig, KGDetConfig,
    NeckConfig, OptimConfig, TestConfig)

_DATA_ROOT = 'data/deepfashion2'

_data = dict(img_scale=(1333, 800), max_gts=32, batch_size=8,
             canvas_hw=((800, 1344), (1344, 800)))

config = KGDetConfig(
    detector_type='faster_rcnn',
    rcnn_head='res_layer',
    backbone=BackboneConfig(depth=50, num_stages=3, out_indices=(2,),
                            style='caffe', frozen_stages=1),
    neck=NeckConfig(type='Identity', out_channels=1024),
    head=HeadConfig(num_classes=13, point_strides=(16,),
                    anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
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
    work_dir='./work_dirs/faster_rcnn_r50_caffe_c4_1x_deepfashion2',
)
