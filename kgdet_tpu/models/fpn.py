"""Feature Pyramid Network necks (FPN and FPN2-with-level-selection), NHWC.

Parity references: /root/reference/mmdetection/mmdet/models/necks/fpn.py:11-139
and fpn2.py:11-141 (lateral 1x1 + nearest-2x top-down + 3x3 output convs,
extra stride-2 convs on the last backbone input for P6/P7, optional GN,
select_out returning a subset of pyramid levels).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from kgdet_tpu.models.layers import ConvModule, upsample_nearest_2x


def xavier_uniform_init():
    return nn.initializers.variance_scaling(1.0, 'fan_avg', 'uniform')


class FPN(nn.Module):
    """Standard FPN; FPN2 behavior is obtained via ``select_out``."""
    in_channels: Sequence[int]
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    select_out: Optional[Sequence[int]] = None
    norm: Optional[str] = None
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        used = end - self.start_level

        def cm(features, k, stride, name):
            return ConvModule(
                features, k, strides=stride, norm=self.norm,
                gn_groups=self.gn_groups, act=None,
                kernel_init=xavier_uniform_init(), dtype=self.dtype, name=name)

        laterals = [
            cm(self.out_channels, 1, 1, f'lateral_{i}')(
                inputs[i + self.start_level])
            for i in range(used)
        ]
        for i in range(used - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample_nearest_2x(laterals[i])

        outs = [cm(self.out_channels, 3, 1, f'fpn_{i}')(laterals[i])
                for i in range(used)]

        if self.num_outs > len(outs):
            extra = self.num_outs - used
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                src = (inputs[end - 1] if self.extra_convs_on_inputs
                       else outs[-1])
                outs.append(cm(self.out_channels, 3, 2, f'fpn_{used}')(src))
                for i in range(used + 1, self.num_outs):
                    src = outs[-1]
                    if self.relu_before_extra_convs:
                        src = nn.relu(src)
                    outs.append(cm(self.out_channels, 3, 2, f'fpn_{i}')(src))

        if self.select_out is not None:
            return tuple(outs[i] for i in self.select_out)
        return tuple(outs)

    @classmethod
    def from_config(cls, ncfg, dtype=jnp.float32, name='neck'):
        """Build from a NeckConfig (shared by every detector family)."""
        return cls(in_channels=ncfg.in_channels,
                   out_channels=ncfg.out_channels,
                   start_level=ncfg.start_level, end_level=ncfg.end_level,
                   num_outs=ncfg.num_outs,
                   add_extra_convs=ncfg.add_extra_convs,
                   select_out=ncfg.select_out, norm=ncfg.norm,
                   gn_groups=ncfg.gn_groups, dtype=dtype, name=name)
