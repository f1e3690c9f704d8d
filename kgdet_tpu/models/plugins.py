"""Backbone plugins: GCNet context block and Non-Local block (NHWC).

Parity references: /root/reference/mmdetection/mmdet/ops/context_block.py
(ContextBlock: attention-pooled global context -> channel add/mul term) and
mmdet/models/plugins/non_local.py (embedded-gaussian NonLocal2D).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ContextBlock(nn.Module):
    """GCNet: global context via attention pooling + bottleneck transform."""
    ratio: float = 1.0 / 16
    pooling_type: str = 'att'        # 'att' | 'avg'
    fusion_types: Sequence[str] = ('channel_add',)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        planes = max(int(C * self.ratio), 1)

        if self.pooling_type == 'att':
            attn = nn.Conv(1, (1, 1), dtype=self.dtype,
                           name='conv_mask')(x).reshape(B, H * W, 1)
            attn = nn.softmax(attn, axis=1)
            context = jnp.einsum('bpc,bpo->boc',
                                 x.reshape(B, H * W, C), attn)
            context = context.reshape(B, 1, 1, C)
        else:
            context = x.mean(axis=(1, 2), keepdims=True)

        out = x
        for fusion in self.fusion_types:
            if fusion not in ('channel_add', 'channel_mul'):
                raise ValueError(fusion)
            t = nn.Conv(planes, (1, 1), dtype=self.dtype,
                        name=f'{fusion}_conv1')(context)
            t = nn.LayerNorm(dtype=self.dtype, name=f'{fusion}_ln')(t)
            t = nn.relu(t)
            t = nn.Conv(C, (1, 1), kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name=f'{fusion}_conv2')(t)
            if fusion == 'channel_add':
                out = out + t
            else:
                out = out * nn.sigmoid(t)
        return out


class NonLocal2D(nn.Module):
    """Embedded-gaussian non-local block."""
    reduction: int = 2
    use_scale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        inter = max(C // self.reduction, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name='theta')(x)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name='phi')(x)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name='g')(x)
        P = H * W
        theta = theta.reshape(B, P, inter)
        phi = phi.reshape(B, P, inter)
        g = g.reshape(B, P, inter)
        attn = jnp.einsum('bpc,bqc->bpq', theta, phi,
                          preferred_element_type=jnp.float32)
        if self.use_scale:
            attn = attn / jnp.sqrt(float(inter))
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        y = jnp.einsum('bpq,bqc->bpc', attn, g).reshape(B, H, W, inter)
        y = nn.Conv(C, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name='conv_out')(y)
        return x + y
