"""Shared NN building blocks (flax.linen, NHWC, mixed-precision friendly).

Parity references: ConvModule / norm builders in
/root/reference/mmdetection/mmdet/models/utils/conv_module.py:44-160 and
norm.py:12-56 (conv -> norm -> act ordering, bias auto-disabled under norm).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax


def he_normal_init():
    return nn.initializers.variance_scaling(2.0, 'fan_out', 'truncated_normal')


def normal_init(std=0.01):
    return nn.initializers.normal(stddev=std)


def bias_init_with_prob(prior_prob=0.01):
    """Focal-loss classification bias prior (reference utils/weight_init)."""
    val = float(-np.log((1 - prior_prob) / prior_prob))
    return nn.initializers.constant(val)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently-frozen running statistics.

    KGDet trains its ResNet trunk with BN in eval mode (norm_eval=True,
    reference resnet.py:518-525): running mean/var come from the pretrained
    checkpoint and never update; scale/bias remain trainable parameters
    (frozen-stage params are masked out in the optimizer instead).
    Stats live in the 'batch_stats' collection so converters can target them.
    """
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((c,), jnp.float32))
        # per-channel input moments for offline stat calibration
        # (utils/bn_calibration.py) — built only when the caller made
        # 'intermediates' mutable: the moment reductions over full-size
        # activations are NOT free to trace-and-DCE on every step
        if self.is_mutable_collection('intermediates'):
            xf = x.astype(jnp.float32)
            self.sow('intermediates', 'in_mean',
                     xf.mean(axis=tuple(range(x.ndim - 1))))
            self.sow('intermediates', 'in_var',
                     xf.var(axis=tuple(range(x.ndim - 1))))
        # f32 affine with a bf16 store: measured FASTER than a bf16 affine
        # on v5e (148.6 vs 171.6 img/s inference) — XLA folds the f32
        # per-channel multiply-add into the conv's f32 accumulator epilogue,
        # while bf16-typed scale ops lower to extra vector work
        inv = lax.rsqrt(var.value + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean.value) * inv + bias
        return y.astype(self.dtype)


class ConvModule(nn.Module):
    """conv -> (norm) -> (act). Bias auto-disabled when a norm follows."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = 'SAME'
    norm: Optional[str] = None          # None | 'gn' | 'frozen_bn'
    gn_groups: int = 32
    act: Optional[Callable] = nn.relu
    use_bias: Optional[bool] = None
    kernel_init: Callable = he_normal_init()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        use_bias = self.use_bias
        if use_bias is None:
            use_bias = self.norm is None
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=self.padding, use_bias=use_bias,
                    kernel_init=self.kernel_init, bias_init=self.bias_init,
                    dtype=self.dtype, name='conv')(x)
        if self.norm == 'gn':
            x = nn.GroupNorm(num_groups=self.gn_groups, epsilon=1e-5,
                             dtype=self.dtype, name='gn')(x)
        elif self.norm == 'frozen_bn':
            x = FrozenBatchNorm(dtype=self.dtype, name='bn')(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ConvWS(nn.Module):
    """Weight-standardized conv (parity: mmdet/models/utils/conv_ws.py):
    kernel is normalized to zero mean / unit std over (kh, kw, cin) per
    output channel before the convolution."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = 'SAME'
    use_bias: bool = True
    eps: float = 1e-5
    kernel_init: Callable = he_normal_init()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param('kernel', self.kernel_init,
                            (k, k, cin, self.features), jnp.float32)
        mean = kernel.mean(axis=(0, 1, 2), keepdims=True)
        std = kernel.std(axis=(0, 1, 2), keepdims=True)
        kernel = ((kernel - mean) / (std + self.eps)).astype(self.dtype)
        pad = self.padding
        if isinstance(pad, str):
            padding = pad
        else:
            padding = [(pad, pad)] * 2
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kernel, (self.strides, self.strides),
            padding, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def max_pool_3x3_s2(x):
    """3x3/2 max-pool with pad=1 (torch stem semantics: -inf padding)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
