"""KGDet demo-set overfit recipe (training-pipeline learning proof).

Same full 294-keypoint cascade as the demo config, at a reduced canvas
(256x448 buckets) so TPU compiles stay short, with a higher Adam LR, no
flip, and enough epochs to overfit the 32-image demo set. Used by
tools/run_overfit_proof.py to record bbox/kpt AP climbing from the
untrained baseline (docs/training_proof.md).
"""
from kgdet_tpu.config import (
    AssignConfig, BackboneConfig, DataConfig, HeadConfig, KGDetConfig,
    NeckConfig, OptimConfig, TestConfig)

_DATA_ROOT = '/root/reference/data/demo_dataset'

_data = dict(
    ann_file=f'{_DATA_ROOT}/demo_dataset-32.json',
    img_prefix=f'{_DATA_ROOT}/image',
    img_scale=(448, 256), max_gts=16, batch_size=2,
    canvas_hw=((256, 448), (448, 256)))

config = KGDetConfig(
    # no pretrained weights on this box: train everything (freezing stage 1
    # would pin it at random init and stall learning)
    backbone=BackboneConfig(depth=50, frozen_stages=-1),
    neck=NeckConfig(
        in_channels=(256, 512, 1024, 2048), out_channels=256,
        start_level=1, num_outs=5, add_extra_convs=True,
        select_out=(2,), norm='gn', gn_groups=32),
    head=HeadConfig(num_classes=13, num_keypts=294, point_strides=(32,),
                    transform_method='moment', norm='gn'),
    assigner=AssignConfig(scale=4, pos_num=25),
    test=TestConfig(),
    optim=OptimConfig(type='adam', lr=5e-4, weight_decay=0.0,
                      warmup_iters=200,
                      grad_clip_norm=10.0,
                      lr_step_epochs=(60,), total_epochs=80),
    train_data=DataConfig(flip_ratio=0.0, **_data),
    val_data=DataConfig(flip_ratio=0.0, **_data),
    work_dir='./work_dirs/kgdet_demo_overfit',
)
