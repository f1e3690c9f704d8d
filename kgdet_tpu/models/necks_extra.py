"""Extra necks: HRFPN (HRNet feature pyramid) and BFP (Libra R-CNN).

Parity references: /root/reference/mmdetection/mmdet/models/necks/
hrfpn.py:12-103 (bilinear-upsample all branches to the finest, concat,
1x1 reduction, avg/max-pool pyramid, per-level 3x3 convs) and
bfp.py:11-102 (gather-resize-average at the refine level, optional
conv/non-local refine, residual scatter back to every level).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _resize(x, hw, method):
    return jax.image.resize(x, x.shape[:1] + tuple(hw) + x.shape[3:],
                            method=method)


class HRFPN(nn.Module):
    """Concat-reduce HRNet pyramid neck."""
    in_channels: Sequence[int] = (32, 64, 128, 256)
    out_channels: int = 256
    num_outs: int = 5
    pooling: str = 'avg'             # 'avg' | 'max'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == len(self.in_channels)
        H, W = inputs[0].shape[1:3]
        ups = [inputs[0]] + [
            _resize(f, (H, W), 'bilinear') for f in inputs[1:]]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, 'fan_in', 'uniform'),
                    dtype=self.dtype, name='reduction_conv')(x)
        outs = [x]
        for i in range(1, self.num_outs):
            k = 2 ** i
            pool = nn.avg_pool if self.pooling == 'avg' else nn.max_pool
            outs.append(pool(x, (k, k), strides=(k, k)))
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding='SAME',
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, 'fan_in', 'uniform'),
                    dtype=self.dtype, name=f'fpn_convs_{i}')(o)
            for i, o in enumerate(outs))

    @classmethod
    def from_config(cls, ncfg, dtype=jnp.float32, name='neck'):
        return cls(in_channels=ncfg.in_channels,
                   out_channels=ncfg.out_channels, num_outs=ncfg.num_outs,
                   dtype=dtype, name=name)


class BFP(nn.Module):
    """Balanced Feature Pyramid: strengthen every level with the refined
    average of all levels (Libra R-CNN)."""
    out_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: str = 'non_local'   # None | 'conv' | 'non_local'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        assert len(inputs) == self.num_levels
        ref_hw = inputs[self.refine_level].shape[1:3]
        gathered = []
        for i, f in enumerate(inputs):
            if i < self.refine_level:
                # adaptive max pool down to the refine size: stride pooling
                # with exact output size via resize-after-max when the
                # ratio is integral (it is for power-of-2 pyramids)
                k = f.shape[1] // ref_hw[0]
                g = nn.max_pool(f, (k, k), strides=(k, k)) if k > 1 else f
                if g.shape[1:3] != tuple(ref_hw):
                    g = _resize(g, ref_hw, 'nearest')
            else:
                g = _resize(f, ref_hw, 'nearest')
            gathered.append(g)
        bsf = sum(gathered) / len(gathered)

        if self.refine_type == 'conv':
            bsf = nn.Conv(self.out_channels, (3, 3), padding='SAME',
                          dtype=self.dtype, name='refine')(bsf)
        elif self.refine_type == 'non_local':
            from kgdet_tpu.models.plugins import NonLocal2D
            bsf = NonLocal2D(dtype=self.dtype, name='refine')(bsf)

        outs = []
        for i, f in enumerate(inputs):
            hw = f.shape[1:3]
            if i < self.refine_level:
                r = _resize(bsf, hw, 'nearest')
            else:
                k = bsf.shape[1] // max(hw[0], 1)
                r = nn.max_pool(bsf, (k, k), strides=(k, k)) \
                    if k > 1 else bsf
                if r.shape[1:3] != tuple(hw):
                    r = _resize(r, hw, 'nearest')
            outs.append(f + r)
        return tuple(outs)

    @classmethod
    def from_config(cls, ncfg, dtype=jnp.float32, name='neck'):
        return cls(out_channels=ncfg.out_channels,
                   num_levels=ncfg.num_outs,
                   refine_level=ncfg.bfp_refine_level,
                   refine_type=ncfg.bfp_refine_type, dtype=dtype,
                   name=name)


class FPNBFP(nn.Module):
    """FPN followed by a BFP refine (the Libra R-CNN neck composition:
    reference configs use neck=[FPN, BFP])."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    start_level: int = 0
    end_level: int = -1
    num_outs: int = 5
    add_extra_convs: bool = False
    select_out: Any = None
    norm: Any = None
    gn_groups: int = 32
    refine_level: int = 2
    refine_type: str = 'non_local'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        from kgdet_tpu.models.fpn import FPN
        pyr = FPN(in_channels=self.in_channels,
                  out_channels=self.out_channels,
                  start_level=self.start_level, end_level=self.end_level,
                  num_outs=self.num_outs,
                  add_extra_convs=self.add_extra_convs,
                  select_out=None, norm=self.norm,
                  gn_groups=self.gn_groups, dtype=self.dtype,
                  name='fpn')(inputs)
        outs = BFP(out_channels=self.out_channels, num_levels=len(pyr),
                   refine_level=self.refine_level,
                   refine_type=self.refine_type, dtype=self.dtype,
                   name='bfp')(pyr)
        if self.select_out is not None:
            return tuple(outs[i] for i in self.select_out)
        return outs

    @classmethod
    def from_config(cls, ncfg, dtype=jnp.float32, name='neck'):
        return cls(in_channels=ncfg.in_channels,
                   out_channels=ncfg.out_channels,
                   start_level=ncfg.start_level, end_level=ncfg.end_level,
                   num_outs=ncfg.num_outs,
                   add_extra_convs=ncfg.add_extra_convs,
                   select_out=ncfg.select_out, norm=ncfg.norm,
                   gn_groups=ncfg.gn_groups,
                   refine_level=ncfg.bfp_refine_level,
                   refine_type=ncfg.bfp_refine_type, dtype=dtype,
                   name=name)
