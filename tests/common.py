"""Shared test helpers: tiny model configs sized for the 1-core CPU harness."""
from __future__ import annotations

import numpy as np

from kgdet_tpu.config import (
    BackboneConfig, DataConfig, HeadConfig, KGDetConfig, NeckConfig,
    TestConfig)

TINY_KPTS = 12
TINY_CANVAS = (64, 96)


def tiny_cfg(num_keypts: int = TINY_KPTS) -> KGDetConfig:
    """A structurally-complete but small KGDet config (ResNet-18, 64ch)."""
    return KGDetConfig(
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(in_channels=(64, 128, 256, 512), out_channels=64),
        head=HeadConfig(num_classes=13, in_channels=64, feat_channels=64,
                        point_feat_channels=64, stacked_convs=1,
                        num_keypts=num_keypts, gn_groups=8),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20),
    )


def synth_batch(canvas=TINY_CANVAS, B=2, G=4, K=TINY_KPTS, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(B, canvas[0], canvas[1], 3).astype(np.float32)
    ctr = rng.uniform(20, 60, (B, G, 2))
    wh = rng.uniform(20, 40, (B, G, 2))
    gts = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    labels = rng.randint(1, 14, (B, G)).astype(np.int32)
    kpts = rng.uniform(10, 60, (B, G, K, 3)).astype(np.float32)
    kpts[..., 2] = (rng.rand(B, G, K) > 0.5).astype(np.float32)
    mask = np.ones((B, G), bool)
    mask[:, -1] = False
    return {
        'image': img,
        'valid_hw': np.tile(np.asarray(canvas, np.int32), (B, 1)),
        'gt_bboxes': gts,
        'gt_labels': labels,
        'gt_kpts': kpts,
        'gt_mask': mask,
    }
