"""Detector composition: backbone -> neck -> head (single-stage, keypointed).

Parity reference: /root/reference/mmdetection/mmdet/models/detectors/
single_stage.py:10-70 and reppoints_detector_kp.py:10-148 (composition only;
loss/postprocess are functional and live in kgdet_tpu.core). Head families
are dispatched through models/families.py — one registry record per family.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from kgdet_tpu.config import BACKBONES, DETECTORS, HEADS, NECKS, KGDetConfig
from kgdet_tpu.models.families import get_head_family
from kgdet_tpu.models.fpn import FPN
from kgdet_tpu.models.kgdet_head import KGDetHead
from kgdet_tpu.models.resnet import ResNet, ResNeXt
from kgdet_tpu.models.retina_head import RetinaHead
from kgdet_tpu.models.hrnet import HRNet
from kgdet_tpu.models.necks_extra import BFP, FPNBFP, HRFPN
from kgdet_tpu.models.serial_head import SerialKpHead
from kgdet_tpu.models.vgg import SSDVGG

BACKBONES.register(ResNet)
BACKBONES.register(ResNeXt)
BACKBONES.register(SSDVGG)
BACKBONES.register(HRNet)
NECKS.register(FPN)
NECKS.register(HRFPN)
NECKS.register(FPNBFP)
NECKS.register(BFP, name='BFP')
HEADS.register(KGDetHead)
HEADS.register(SerialKpHead)
HEADS.register(RetinaHead)


def compute_dtype(cfg: KGDetConfig):
    return jnp.bfloat16 if cfg.compute_dtype == 'bfloat16' else jnp.float32


def build_backbone(cfg: KGDetConfig, dtype, name='backbone'):
    """Config-driven backbone shared by every detector family."""
    return BACKBONES.get(cfg.backbone.type).from_config(
        cfg.backbone, dtype=dtype, name=name)


def build_neck(cfg: KGDetConfig, dtype, name='neck'):
    """Config-driven neck shared by every detector family.

    type 'Identity' (reference neck=None, e.g. the SSD recipes) returns
    None; callers feed backbone outputs straight to the head."""
    if cfg.neck.type in (None, 'none', 'Identity'):
        return None
    return NECKS.get(cfg.neck.type).from_config(
        cfg.neck, dtype=dtype, name=name)


@DETECTORS.register
class KGDetDetector(nn.Module):
    """backbone -> neck -> head, all three resolved from the config."""
    cfg: KGDetConfig

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalized. Returns list-of-level head dicts."""
        cfg = self.cfg
        dtype = compute_dtype(cfg)
        backbone = build_backbone(cfg, dtype)
        neck = build_neck(cfg, dtype)
        head = get_head_family(cfg.head.type).build(cfg, dtype)
        feats = backbone(images)
        return head(neck(feats) if neck is not None else feats)
