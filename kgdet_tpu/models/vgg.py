"""SSDVGG backbone: VGG-16/19 trunk + SSD extra layers + L2Norm, NHWC.

Parity reference: /root/reference/mmdetection/mmdet/models/backbones/
ssd_vgg.py:13-140 (mmcv VGG features with ceil-mode pools, the stride-1
pool5 + dilated fc6/fc7 convs, 'S'-stride extra layers alternating 1x1/3x3,
and the per-channel L2Norm on the conv4_3 output).

Module names carry the torch ``features.<i>`` / ``extra.<i>`` indices so the
.pth converter is a pure name map. The trunk emits the SSD300/512 pyramid
(conv4_3 L2-normalized, fc7, plus one map per extra-layer pair); the SSD
detector composes it with neck type 'Identity'.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

VGG_ARCH = {16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}

# SSD extra-layer output-channel programs ('S' marks a stride-2 3x3)
EXTRA_SETTING = {
    300: (256, 'S', 512, 128, 'S', 256, 128, 256, 128, 256),
    512: (256, 'S', 512, 128, 'S', 256, 128, 'S', 256, 128, 'S', 256, 128),
}


def _ceil_max_pool_2x2(x):
    """2x2/2 max pool with ceil_mode=True (mmcv VGG pools)."""
    B, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class L2Norm(nn.Module):
    """Per-channel L2 normalization with a learned scale (ssd_vgg.py
    L2Norm: f32 norm over channels, scale init l2_norm_scale)."""
    scale_init: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        w = self.param('scale', nn.initializers.constant(self.scale_init),
                       (C,), jnp.float32)
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + self.eps
        return (w * xf / norm).astype(x.dtype)


class SSDVGG(nn.Module):
    """VGG trunk + SSD extras; returns the 6-level (300) / 7-level (512)
    feature pyramid."""
    depth: int = 16
    input_size: int = 300
    with_last_pool: bool = False
    out_feature_indices: Tuple[int, ...] = (22, 34)
    l2_norm_scale: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        arch = VGG_ARCH[self.depth]
        x = x.astype(self.dtype)
        outs = []
        idx = 0
        channels = (64, 128, 256, 512, 512)

        def conv(features, k, name, dilation=1, padding=None, stride=1):
            if padding is None:
                padding = k // 2 * dilation
            return nn.Conv(
                features, (k, k), strides=(stride, stride),
                padding=[(padding, padding)] * 2,
                kernel_dilation=(dilation, dilation),
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype, name=name)

        for block, n_convs in enumerate(arch):
            for _ in range(n_convs):
                x = conv(channels[block], 3, f'features_{idx}')(x)
                idx += 1
                x = nn.relu(x)
                if idx in self.out_feature_indices:
                    outs.append(x)
                idx += 1
            is_last = block == len(arch) - 1
            if not is_last or self.with_last_pool:
                x = _ceil_max_pool_2x2(x)
                idx += 1

        # SSD tail: stride-1 3x3 pool, dilated fc6, 1x1 fc7 (ssd_vgg.py
        # __init__ add_module block)
        x = nn.max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                                constant_values=-jnp.inf),
                        (3, 3), strides=(1, 1))
        idx += 1
        x = conv(1024, 3, f'features_{idx}', dilation=6, padding=6)(x)
        idx += 1
        x = nn.relu(x)
        if idx in self.out_feature_indices:
            outs.append(x)
        idx += 1
        x = conv(1024, 1, f'features_{idx}')(x)
        idx += 1
        x = nn.relu(x)
        if idx in self.out_feature_indices:
            outs.append(x)

        # extra layers: alternating 1x1 / 3x3; 'S' = stride-2 pad-1 3x3
        setting = EXTRA_SETTING[self.input_size]
        n = 0
        i = 0
        while i < len(setting):
            k = (1, 3)[n % 2]
            if setting[i] == 'S':
                x = conv(setting[i + 1], 3, f'extra_{n}', stride=2,
                         padding=1)(x)
                i += 2
            else:
                x = conv(setting[i], k, f'extra_{n}', padding=0)(x)
                i += 1
            x = nn.relu(x)
            n += 1
            if n % 2 == 0:
                outs.append(x)
        if self.input_size == 512:
            x = nn.relu(conv(256, 4, f'extra_{n}', padding=1)(x))
            outs.append(x)

        outs[0] = L2Norm(scale_init=self.l2_norm_scale, name='l2_norm')(
            outs[0])
        return tuple(outs)

    @classmethod
    def from_config(cls, bcfg, dtype=jnp.float32, name='backbone'):
        if bcfg.depth not in VGG_ARCH:
            raise ValueError(
                f'SSDVGG depth must be one of {sorted(VGG_ARCH)}, got '
                f'{bcfg.depth!r} (set backbone.depth explicitly; the '
                f'BackboneConfig default of 50 is a ResNet depth)')
        depth = bcfg.depth
        return cls(depth=depth, input_size=bcfg.vgg_input_size,
                   with_last_pool=bcfg.vgg_with_last_pool,
                   l2_norm_scale=bcfg.l2_norm_scale, dtype=dtype, name=name)
