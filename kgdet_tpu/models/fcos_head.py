"""FCOS head: anchor-free per-pixel classification + distance regression.

Zoo member inherited by the reference (mmdet/models/anchor_heads/
fcos_head.py: 4 GN convs per branch, sigmoid cls, centerness branch,
exp-scaled (l, t, r, b) distances with a learnable per-level scale).

Output per level: {cls (1,B,H,W,C), bbox (1,B,H,W,4) decoded distances,
centerness (1,B,H,W,1)}.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from kgdet_tpu.models.layers import ConvModule, bias_init_with_prob, \
    normal_init


class FCOSHead(nn.Module):
    num_classes: int = 13
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    norm: Optional[str] = 'gn'
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.strides)
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
        fcos_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                           kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           dtype=self.dtype, name='fcos_cls')
        fcos_reg = nn.Conv(4, (3, 3), padding='SAME',
                           kernel_init=normal_init(0.01), dtype=self.dtype,
                           name='fcos_reg')
        fcos_ctr = nn.Conv(1, (3, 3), padding='SAME',
                           kernel_init=normal_init(0.01), dtype=self.dtype,
                           name='fcos_centerness')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides),), jnp.float32)

        outs = []
        for li, x in enumerate(feats):
            cls_feat = x
            reg_feat = x
            for conv in cls_convs:
                cls_feat = conv(cls_feat)
            for conv in reg_convs:
                reg_feat = conv(reg_feat)
            dist = jnp.exp(
                fcos_reg(reg_feat).astype(jnp.float32) * scales[li])
            outs.append({
                'cls': jnp.stack([fcos_cls(cls_feat)]),
                'bbox': jnp.stack([dist]),       # (l, t, r, b) in pixels
                # centerness branches off the cls tower, matching the
                # reference (mmdet fcos_head.py:107) so converted torch
                # checkpoints behave identically
                'centerness': jnp.stack([fcos_ctr(cls_feat)]),
            })
        return outs
