"""Guided-anchoring heads (GA-Retina / GA-RPN).

Parity surface: reference mmdet/models/anchor_heads/guided_anchor_head.py +
ga_retina_head.py + ga_rpn_head.py — a 1x1 conv predicts anchor location
probability, another predicts the (dw, dh) anchor shape per position; a
feature-adaption DCN (offsets derived from the detached shape prediction,
guided_anchor_head.py:18-57) realigns features before the cls/reg convs.

TPU-first notes: the reference's MaskedConv2d is evaluated densely (the
documented dense equivalence in ops/misc_ops.py — masking only saves work on
sparse CUDA launches); feature adaption uses a single deformable group
(the reference default is 4; group support would split channels below the
128-lane tile, so one shared offset field is used instead).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.models.layers import ConvModule, bias_init_with_prob, \
    normal_init
from kgdet_tpu.ops.deform import deform_conv


class FeatureAdaption(nn.Module):
    """3x3 deformable conv whose offsets come from the shape prediction."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shape_pred):
        B, H, W, C = x.shape
        offs = nn.Conv(18, (1, 1), use_bias=False,
                       kernel_init=normal_init(0.1), dtype=self.dtype,
                       name='conv_offset')(
                           jax.lax.stop_gradient(shape_pred))
        base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing='ij'),
                        axis=-1).reshape(9, 2).astype(np.float32)
        rel = offs.reshape(B, H, W, 9, 2) + jnp.asarray(base)
        w = self.param('conv_adaption', normal_init(0.01),
                       (9, C, self.out_channels), jnp.float32)
        return nn.relu(deform_conv(x, rel, w.astype(self.dtype)))


class GARPNHead(nn.Module):
    """Guided-anchor RPN: shared 3x3 conv, loc/shape branches, feature
    adaption, then class-agnostic 1x1 objectness/regression
    (reference ga_rpn_head.py:13-33)."""
    in_channels: int = 256
    feat_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        rpn_conv = nn.Conv(self.feat_channels, (3, 3), padding='SAME',
                           kernel_init=normal_init(0.01), dtype=self.dtype,
                           name='rpn_conv')
        conv_loc = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           dtype=self.dtype, name='conv_loc')
        conv_shape = nn.Conv(2, (1, 1), kernel_init=normal_init(0.01),
                             dtype=self.dtype, name='conv_shape')
        fa = FeatureAdaption(self.feat_channels, dtype=self.dtype,
                             name='feature_adaption')
        conv_cls = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           dtype=self.dtype, name='conv_cls')
        conv_reg = nn.Conv(4, (1, 1), kernel_init=normal_init(0.01),
                           dtype=self.dtype, name='conv_reg')

        outs = []
        for x in feats:
            t = nn.relu(rpn_conv(x))
            loc = conv_loc(t)
            shape = conv_shape(t)
            t_a = fa(t, shape)
            outs.append({
                'cls': jnp.stack([conv_cls(t_a)]),
                'bbox': jnp.stack([conv_reg(t_a)]),
                'shape': jnp.stack([shape]),
                'loc': jnp.stack([loc]),
            })
        return outs


class GARetinaHead(nn.Module):
    """Retina towers + guided anchoring (one guided anchor per position)."""
    num_classes: int = 13
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    norm: Optional[str] = None
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.anchor_strides)
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
        conv_loc = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           bias_init=bias_init_with_prob(0.01),
                           dtype=self.dtype, name='conv_loc')
        conv_shape = nn.Conv(2, (1, 1), kernel_init=normal_init(0.01),
                             dtype=self.dtype, name='conv_shape')
        fa_cls = FeatureAdaption(self.feat_channels, dtype=self.dtype,
                                 name='feature_adaption_cls')
        fa_reg = FeatureAdaption(self.feat_channels, dtype=self.dtype,
                                 name='feature_adaption_reg')
        retina_cls = nn.Conv(self.num_classes, (3, 3), padding='SAME',
                             kernel_init=normal_init(0.01),
                             bias_init=bias_init_with_prob(0.01),
                             dtype=self.dtype, name='retina_cls')
        retina_reg = nn.Conv(4, (3, 3), padding='SAME',
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
            loc = conv_loc(cls_feat)
            shape = conv_shape(reg_feat)
            cls_feat = fa_cls(cls_feat, shape)
            reg_feat = fa_reg(reg_feat, shape)
            outs.append({
                'cls': jnp.stack([retina_cls(cls_feat)]),
                'bbox': jnp.stack([retina_reg(reg_feat)]),
                'shape': jnp.stack([shape]),
                'loc': jnp.stack([loc]),
            })
        return outs
