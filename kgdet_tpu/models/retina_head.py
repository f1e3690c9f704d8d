"""RetinaNet head: anchor-based single-stage classification + box regression.

Zoo member inherited by the reference (mmdet/models/anchor_heads/
retina_head.py: 4 stacked convs per branch, A*num_classes sigmoid cls and
A*4 delta regression per level over a 5-level FPN with octave anchor scales).

Output format follows the framework convention: per level a dict with
  cls:  (1, B, H, W, A*num_classes)
  bbox: (1, B, H, W, A*4)           delta-encoded (decoded in the loss/post)
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.models.layers import ConvModule, bias_init_with_prob, \
    normal_init
from kgdet_tpu.ops.anchors import base_anchors


class RetinaHead(nn.Module):
    num_classes: int = 13
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    octave_base_scale: int = 4
    scales_per_octave: int = 3
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    norm: Optional[str] = None
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @property
    def num_anchors(self):
        return len(self.anchor_ratios) * self.scales_per_octave

    def base_anchors_per_level(self):
        scales = [self.octave_base_scale * 2 ** (i / self.scales_per_octave)
                  for i in range(self.scales_per_octave)]
        return [base_anchors(s, scales, self.anchor_ratios)
                for s in self.anchor_strides]

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.anchor_strides)
        A = self.num_anchors
        cls_convs = [ConvModule(self.feat_channels, 3, norm=self.norm,
                                gn_groups=self.gn_groups,
                                kernel_init=normal_init(0.01),
                                dtype=self.dtype, name=f'cls_convs_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [ConvModule(self.feat_channels, 3, norm=self.norm,
                                gn_groups=self.gn_groups,
                                kernel_init=normal_init(0.01),
                                dtype=self.dtype, name=f'reg_convs_{i}')
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(A * self.num_classes, (3, 3), padding='SAME',
                             kernel_init=normal_init(0.01),
                             bias_init=bias_init_with_prob(0.01),
                             dtype=self.dtype, name='retina_cls')
        retina_reg = nn.Conv(A * 4, (3, 3), padding='SAME',
                             kernel_init=normal_init(0.01),
                             dtype=self.dtype, name='retina_reg')

        outs = []
        for x in feats:
            cls_feat = x
            reg_feat = x
            for conv in cls_convs:
                cls_feat = conv(cls_feat)
            for conv in reg_convs:
                reg_feat = conv(reg_feat)
            outs.append({
                'cls': jnp.stack([retina_cls(cls_feat)]),
                'bbox': jnp.stack([retina_reg(reg_feat)]),
            })
        return outs
