"""ResNet backbone family (18/34/50/101/152) in flax.linen, NHWC.

TPU-first design notes:
- BN is FrozenBatchNorm (stats fixed, affine trainable) because KGDet always
  runs the trunk with norm_eval=True; this keeps the module pure and lets the
  whole forward fuse under jit.
- frozen_stages is enforced by the optimizer param mask
  (kgdet_tpu.parallel.train.frozen_param_mask), not by module state.
- module/param naming mirrors torchvision layout (conv1/bn1, layerN/<i>/...)
  so the .pth converter is a pure name map.

Parity reference: /root/reference/mmdetection/mmdet/models/backbones/
resnet.py:15-525 (pytorch-style blocks: stride lives on the 3x3 conv).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from kgdet_tpu.models.layers import FrozenBatchNorm, he_normal_init, \
    max_pool_3x3_s2

ARCH_SETTINGS = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


def _conv(features, k, s=1, name=None):
    return nn.Conv(features, (k, k), strides=(s, s), padding=[(k // 2,) * 2] * 2,
                   use_bias=False, kernel_init=he_normal_init(), name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.planes, 3, self.stride, 'conv1')(x)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn1')(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, 'conv2')(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn2')(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, 'downsample_conv')(x)
            identity = FrozenBatchNorm(
                dtype=self.dtype, name='downsample_bn')(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """pytorch-style bottleneck: the stride sits on the 3x3 conv."""
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.planes, 1, 1, 'conv1')(x)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn1')(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, 'conv2')(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn2')(out)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, 'conv3')(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn3')(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride,
                             'downsample_conv')(x)
            identity = FrozenBatchNorm(
                dtype=self.dtype, name='downsample_bn')(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = BasicBlock if block_type == 'basic' else Bottleneck
        expansion = 1 if block_type == 'basic' else 4

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=he_normal_init(),
                    name='conv1')(x)
        x = FrozenBatchNorm(dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        outs = []
        planes = 64
        in_ch = 64
        for stage in range(self.num_stages):
            stride = 1 if stage == 0 else 2
            num_blocks = stage_blocks[stage]
            for i in range(num_blocks):
                s = stride if i == 0 else 1
                need_ds = (i == 0) and (s != 1 or in_ch != planes * expansion)
                x = block_cls(planes=planes, stride=s, downsample=need_ds,
                              dtype=self.dtype,
                              name=f'layer{stage + 1}/{i}')(x)
                in_ch = planes * expansion
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)

    @staticmethod
    def stage_channels(depth):
        block_type, _ = ARCH_SETTINGS[depth]
        e = 1 if block_type == 'basic' else 4
        return [64 * e, 128 * e, 256 * e, 512 * e]
