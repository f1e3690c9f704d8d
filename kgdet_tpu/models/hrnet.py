"""HRNet backbone (multi-branch high-resolution network), NHWC flax.

Parity reference: /root/reference/mmdetection/mmdet/models/backbones/
hrnet.py:13-478 — two 3x3/2 stem convs, a Bottleneck stage-1 (layer1),
then three multi-branch stages of HRModules: per-branch BasicBlock chains
followed by full cross-resolution fusion (1x1 conv+BN+nearest-upsample for
coarser->finer, chains of 3x3/2 conv+BN(+ReLU) for finer->coarser).
Transitions add one new half-resolution branch per stage.

Module names mirror the torch state-dict layout (stage3.2.branches.1.3,
fuse_layers.i.j, transition2.2.0) so utils/torch_convert stays a pure name
map. The canonical HRNetV2p widths (W18/W32/W40) are selected by the
``width`` field; block counts follow the published architecture
(num_modules 1/1/4/3, BasicBlock x4 per branch).
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from kgdet_tpu.models.layers import FrozenBatchNorm, he_normal_init, \
    upsample_nearest_2x
from kgdet_tpu.models.resnet import BasicBlock, Bottleneck, _conv

# (num_modules, num_branches, num_blocks-per-branch) for stages 2..4
STAGE_PLAN = ((1, 2, 4), (4, 3, 4), (3, 4, 4))


class HRNet(nn.Module):
    width: int = 32                  # W18 / W32 / W40 branch base width
    # stage-1 bottleneck channels (canonical 64 -> 256 out)
    stage1_channels: int = 64
    stage1_blocks: int = 4
    dtype: Any = jnp.float32

    def branch_channels(self) -> Tuple[int, ...]:
        w = self.width
        return (w, 2 * w, 4 * w, 8 * w)

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = x.astype(dt)

        def conv_bn(feats, k, s, name, relu=True):
            def apply(t):
                t = _conv(feats, k, s, f'{name}/conv', dtype=dt)(t)
                t = FrozenBatchNorm(dtype=dt, name=f'{name}/bn')(t)
                return nn.relu(t) if relu else t
            return apply

        # stem: two 3x3/2 convs (hrnet.py:236-255)
        x = _conv(64, 3, 2, 'conv1', dtype=dt)(x)
        x = nn.relu(FrozenBatchNorm(dtype=dt, name='bn1')(x))
        x = _conv(64, 3, 2, 'conv2', dtype=dt)(x)
        x = nn.relu(FrozenBatchNorm(dtype=dt, name='bn2')(x))

        # stage 1: Bottleneck x4 (layer1)
        for i in range(self.stage1_blocks):
            x = Bottleneck(planes=self.stage1_channels, stride=1,
                           downsample=i == 0, dtype=dt,
                           name=f'layer1/{i}')(x)

        chans = self.branch_channels()
        feats = [x]                      # current branch list
        pre_chans = [self.stage1_channels * 4]

        for si, (num_modules, num_branches, num_blocks) in \
                enumerate(STAGE_PLAN):
            stage_idx = si + 2
            cur_chans = list(chans[:num_branches])

            # transition (hrnet.py:312-357): channel-fix convs on existing
            # branches, one stride-2 chain for the new branch off the last
            new_feats = []
            for i in range(num_branches):
                tname = f'transition{stage_idx - 1}/{i}'
                if i < len(pre_chans):
                    if pre_chans[i] != cur_chans[i]:
                        new_feats.append(conv_bn(
                            cur_chans[i], 3, 1, f'{tname}/0')(feats[i]))
                    else:
                        new_feats.append(feats[i])
                else:
                    t = feats[-1]
                    for j in range(i + 1 - len(pre_chans)):
                        out_c = cur_chans[i] \
                            if j == i - len(pre_chans) else pre_chans[-1]
                        t = conv_bn(out_c, 3, 2, f'{tname}/{j}')(t)
                    new_feats.append(t)
            feats = new_feats

            # HRModules
            for m in range(num_modules):
                base = f'stage{stage_idx}/{m}'
                # branches: BasicBlock chains
                outs = []
                for b in range(num_branches):
                    t = feats[b]
                    for k in range(num_blocks):
                        t = BasicBlock(planes=cur_chans[b], stride=1,
                                       downsample=False, dtype=dt,
                                       name=f'{base}/branches/{b}/{k}')(t)
                    outs.append(t)
                # full fusion (hrnet.py:114-194)
                fused = []
                for i in range(num_branches):
                    y = outs[i]
                    for j in range(num_branches):
                        if j == i:
                            continue
                        fname = f'{base}/fuse_layers/{i}/{j}'
                        if j > i:
                            t = _conv(cur_chans[i], 1, 1,
                                      f'{fname}/conv', dtype=dt)(outs[j])
                            t = FrozenBatchNorm(dtype=dt,
                                                name=f'{fname}/bn')(t)
                            for _ in range(j - i):
                                t = upsample_nearest_2x(t)
                        else:
                            t = outs[j]
                            for k in range(i - j):
                                last = k == i - j - 1
                                out_c = cur_chans[i] if last \
                                    else cur_chans[j]
                                t = conv_bn(out_c, 3, 2, f'{fname}/{k}',
                                            relu=not last)(t)
                        y = y + t
                    fused.append(nn.relu(y))
                feats = fused
            pre_chans = cur_chans
        return tuple(feats)

    @classmethod
    def from_config(cls, bcfg, dtype=jnp.float32, name='backbone'):
        return cls(width=bcfg.hrnet_width, dtype=dtype, name=name)
