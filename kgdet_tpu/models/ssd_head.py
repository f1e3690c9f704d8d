"""SSD multibox head: per-level conv pairs + softmax classification.

Parity surface: reference mmdet/models/anchor_heads/ssd_head.py — one 3x3
conv pair per level emitting A*(C+1) class logits (softmax with background
at 0) and A*4 deltas; SSD-style anchors (min/max sizes stepped over
basesize_ratio_range, ratio-1 anchors at two scales plus (1/r, r) pairs);
MultiBox loss with 3:1 hard-negative mining lives in
kgdet_tpu/core/anchor_loss.py::ssd_loss.

Unlike the reference's VGG-with-extra-layers trunk, this head runs on any
multi-scale pyramid (the configured backbone+neck), which is the
TPU-friendly composition; the head/anchor/loss semantics are unchanged.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from kgdet_tpu.ops.anchors import ssd_anchor_params, ssd_base_anchors


class SSDHead(nn.Module):
    num_classes: int = 13            # foreground classes (softmax adds bg)
    in_channels: int = 256
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    input_size: int = 300
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    # per-level aspect-ratio sets (reference ssd300 layout)
    anchor_ratios: Tuple[Tuple[int, ...], ...] = \
        ((2,), (2, 3), (2, 3), (2, 3), (2,))
    dtype: Any = jnp.float32

    def num_anchors_per_level(self):
        return [2 + 2 * len(r) for r in self.anchor_ratios]

    def base_anchors_per_level(self):
        mins, maxs = ssd_anchor_params(
            self.input_size, len(self.anchor_strides),
            self.basesize_ratio_range)
        return [ssd_base_anchors(mins[i], maxs[i], self.anchor_strides[i],
                                 self.anchor_ratios[i])
                for i in range(len(self.anchor_strides))]

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.anchor_strides)
        outs = []
        nA = self.num_anchors_per_level()
        C1 = self.num_classes + 1
        init = nn.initializers.xavier_uniform()
        for i, x in enumerate(feats):
            cls = nn.Conv(nA[i] * C1, (3, 3), padding='SAME',
                          kernel_init=init, dtype=self.dtype,
                          name=f'cls_convs_{i}')(x)
            reg = nn.Conv(nA[i] * 4, (3, 3), padding='SAME',
                          kernel_init=init, dtype=self.dtype,
                          name=f'reg_convs_{i}')(x)
            outs.append({'cls': jnp.stack([cls]), 'bbox': jnp.stack([reg])})
        return outs
