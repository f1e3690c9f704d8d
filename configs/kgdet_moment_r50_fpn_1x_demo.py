"""KGDet on the 32-image demo dataset (smoke-test recipe).

Parity reference: /root/reference/configs/kgdet_moment_r50_fpn_1x-demo.py
(same model; demo-dataset paths; the reference swaps SGD for Adam 1e-4 on the
demo set — mirrored here).
"""
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, DataConfig, HeadConfig, KGDetConfig,
    NeckConfig, OptimConfig, TestConfig)

_DATA_ROOT = '/root/reference/data/demo_dataset'

_data = dict(
    ann_file=f'{_DATA_ROOT}/demo_dataset-32.json',
    img_prefix=f'{_DATA_ROOT}/image',
    img_scale=(1333, 800), max_gts=16, batch_size=2,
    canvas_hw=((800, 1344), (1344, 800)))

config = KGDetConfig(
    backbone=BackboneConfig(depth=50, frozen_stages=1),
    neck=NeckConfig(
        in_channels=(256, 512, 1024, 2048), out_channels=256,
        start_level=1, num_outs=5, add_extra_convs=True,
        select_out=(2,), norm='gn', gn_groups=32),
    head=HeadConfig(num_classes=13, num_keypts=294, point_strides=(32,),
                    transform_method='moment', norm='gn'),
    assigner=AssignConfig(scale=4, pos_num=25),
    test=TestConfig(),
    # reference demo recipe: Adam(lr=1e-4) with NO weight decay
    # (/root/reference/configs/kgdet_moment_r50_fpn_1x-demo.py:130)
    optim=OptimConfig(type='adam', lr=1e-4, weight_decay=0.0,
                      warmup_iters=500,
                      lr_step_epochs=(8, 11), total_epochs=12),
    train_data=DataConfig(flip_ratio=0.5, **_data),
    val_data=DataConfig(flip_ratio=0.0, **_data),
    work_dir='./work_dirs/kgdet_moment_r50_fpn_1x_demo',
)
