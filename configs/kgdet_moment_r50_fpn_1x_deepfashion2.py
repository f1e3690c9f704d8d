"""KGDet moment R-50 FPN 1x on DeepFashion2 (TPU-native recipe).

Parity reference: /root/reference/configs/kgdet_moment_r50_fpn_1x-deepfashion2.py
(model: ResNet-50 + FPN2 select_out=[2] + 3-stage cascade head with 294
keypoints / 83 reppoints / moment transform; train: SGD lr 5e-3, momentum 0.9,
wd 1e-4, grad clip 35, warmup 500 iters from lr/3, x0.1 at epochs 8 & 11,
12 epochs, 2 imgs/device x 4 devices).
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
        select_out=(2,), norm='gn', gn_groups=32),
    head=HeadConfig(
        num_classes=13, in_channels=256, feat_channels=256,
        stacked_convs=3, num_keypts=294, point_strides=(32,),
        point_base_scale=4, transform_method='moment', norm='gn'),
    assigner=AssignConfig(scale=4, pos_num=25),
    test=TestConfig(nms_pre=1000, score_thr=0.05, nms_iou_thr=0.5,
                    max_per_img=100),
    optim=OptimConfig(lr=5e-3, momentum=0.9, weight_decay=1e-4,
                      grad_clip_norm=35.0, warmup_iters=500,
                      warmup_ratio=1.0 / 3, lr_step_epochs=(8, 11),
                      total_epochs=12),
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
    work_dir='./work_dirs/kgdet_moment_r50_fpn_1x_deepfashion2',
)
