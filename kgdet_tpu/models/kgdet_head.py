"""KGDet cascade head: keypoints drive multi-column deformable sampling.

Three-stage cascade per pyramid level:
  S1 (plain convs): cls logits, 294-keypoint offset field, and a 83-point
     RepPoints field derived from the keypoints by a 1x1 conv.
  S2/S3 (deformable): the previous stage's RepPoints become the tap positions
     of three parallel deformable convs (9/25/49 taps) per branch; keypoint &
     RepPoints outputs accumulate residually (previous stage detached).

TPU-first redesign vs the reference CUDA head:
- The 6 DeformConvs of a cascade block share one gather: cls/reg features are
  concatenated channel-wise, all 83 taps are sampled in a single
  ``deform_sample`` call, and each column/branch slice feeds its own MXU
  contraction. This eliminates 5/6 of the bilinear-gather traffic.
- 1x1 convs over the flattened (B, H*W, C) layout are Dense matmuls.
- The dcn_base_offset subtraction/re-addition round trip is gone: tap offsets
  are the RepPoints field itself (see kgdet_tpu.ops.deform).

Parity reference: /root/reference/mmdetection/mmdet/models/anchor_heads/
reppoints_head_kp3rep_cas_1_assign_once.py:16-495.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from kgdet_tpu.models.layers import ConvModule, bias_init_with_prob, \
    normal_init
from kgdet_tpu.ops.deform import deform_conv_from_samples, deform_sample, \
    grad_multiply
from kgdet_tpu.ops.points import points2bbox

# tap-count layout of the three deformable columns (3x3, 5x5, 7x7)
COLUMN_TAPS = (9, 25, 49)
NUM_REPPTS = sum(COLUMN_TAPS)  # 83


class KpRepBlock(nn.Module):
    """One cascade stage: (cls logits, keypoint offsets, reppoint offsets)."""
    deform: bool
    cls_out_channels: int
    feat_channels: int = 256
    num_keypts: int = 294
    gradient_mul: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cls_feat, pts_feat, reppts_offset=None):
        kpt_dim = 2 * self.num_keypts
        rep_dim = 2 * NUM_REPPTS
        dense = lambda feats, name, bias_init=nn.initializers.zeros: nn.Dense(
            feats, kernel_init=normal_init(0.01), bias_init=bias_init,
            dtype=self.dtype, name=name)

        if not self.deform:
            conv3 = lambda name: nn.Conv(
                self.feat_channels, (3, 3), padding='SAME',
                kernel_init=normal_init(0.01), dtype=self.dtype, name=name)
            cls_out = dense(self.cls_out_channels, 'cls_out',
                            bias_init_with_prob(0.01))(
                nn.relu(conv3('cls_conv')(cls_feat)))
            keypts_out = dense(kpt_dim, 'keypts_out')(
                nn.relu(conv3('keypts_conv')(pts_feat)))
            reppts_out = dense(rep_dim, 'reppts_out')(keypts_out)
            return cls_out, keypts_out, reppts_out

        B, H, W, C = cls_feat.shape
        offs = grad_multiply(reppts_offset, self.gradient_mul)
        offs = offs.reshape(B, H, W, NUM_REPPTS, 2)  # (dy, dx) per tap

        # one gather for both branches and all three columns
        cat_feat = jnp.concatenate([cls_feat, pts_feat], axis=-1)
        samples = deform_sample(cat_feat, offs)  # (B, P, 83, 2C)

        # The 3 columns of each branch fold into ONE block-diagonal MXU
        # contraction: W[k, :, col(k)*F:] holds column col(k)'s weights and
        # zeros elsewhere, so no k-axis slicing (copies) and no per-column
        # einsum launches. relu(concat(cols)) == concat(relu(cols)).
        F = self.feat_channels
        branch_w = {}
        for branch in ('cls', 'keypts'):
            blocks = []
            for ci, k in enumerate(COLUMN_TAPS):
                ksz = (3, 5, 7)[ci]
                w = self.param(f'{branch}_dfmconv_{ksz}', normal_init(0.01),
                               (k, C, F), jnp.float32).astype(self.dtype)
                row = [jnp.zeros((k, C, F), self.dtype)] * 3
                row[ci] = w
                blocks.append(jnp.concatenate(row, axis=-1))  # (k, C, 3F)
            branch_w[branch] = jnp.concatenate(blocks, axis=0)  # (83, C, 3F)

        cls_cat = nn.relu(deform_conv_from_samples(
            samples[..., :C], branch_w['cls']))        # (B, P, 3F)
        kpt_cat = nn.relu(deform_conv_from_samples(
            samples[..., C:], branch_w['keypts']))
        cls_out = dense(self.cls_out_channels, 'cls_out',
                        bias_init_with_prob(0.01))(cls_cat)
        keypts_out = dense(kpt_dim, 'keypts_out')(kpt_cat)
        reppts_out = dense(rep_dim, 'reppts_out')(keypts_out)
        reshape = lambda t: t.reshape(B, H, W, t.shape[-1])
        return reshape(cls_out), reshape(keypts_out), reshape(reppts_out)


class KGDetHead(nn.Module):
    """3-stage keypoint-guided cascade head over selected pyramid levels.

    Returns, per level, a dict with stacked per-stage tensors:
      cls:  (3, B, H, W, num_classes)   raw logits
      kpt:  (3, B, H, W, 294*2)         y-first offset pairs (stride units)
      bbox: (3, B, H, W, 4)             xyxy in stride units around the center
    """
    num_classes: int = 13        # foreground classes (sigmoid cls)
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_keypts: int = 294
    gradient_mul: float = 0.1
    point_strides: Tuple[int, ...] = (32,)
    point_base_scale: int = 4
    transform_method: str = 'moment'
    moment_mul: float = 0.01
    norm: Optional[str] = 'gn'
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.point_strides)
        if self.transform_method == 'moment':
            moment_transfer = self.param(
                'moment_transfer', nn.initializers.zeros, (2,), jnp.float32)
        else:
            moment_transfer = None

        towers = []
        for prefix in ('cls', 'reg'):
            towers.append([
                ConvModule(self.feat_channels, 3, norm=self.norm,
                           gn_groups=self.gn_groups,
                           kernel_init=normal_init(0.01), dtype=self.dtype,
                           name=f'{prefix}_convs_{i}')
                for i in range(self.stacked_convs)
            ])
        blocks = [
            KpRepBlock(deform=(i > 0), cls_out_channels=self.num_classes,
                       feat_channels=self.feat_channels,
                       num_keypts=self.num_keypts,
                       gradient_mul=self.gradient_mul, dtype=self.dtype,
                       name=f'kp_rep_block_{i + 1}')
            for i in range(3)
        ]

        def to_bbox(reppts):
            return points2bbox(
                reppts.astype(jnp.float32), self.transform_method,
                moment_transfer, self.moment_mul)

        outs = []
        for x in feats:
            cls_feat = x
            pts_feat = x
            for conv in towers[0]:
                cls_feat = conv(cls_feat)
            for conv in towers[1]:
                pts_feat = conv(pts_feat)

            cls1, kpt1, rep1 = blocks[0](cls_feat, pts_feat)
            bbox1 = to_bbox(rep1)

            cls2, kpt2_raw, rep2_raw = blocks[1](cls_feat, pts_feat, rep1)
            kpt2 = kpt2_raw + lax.stop_gradient(kpt1)
            rep2 = rep2_raw + lax.stop_gradient(rep1)
            bbox2 = to_bbox(rep2)

            cls3, kpt3_raw, rep3_raw = blocks[2](cls_feat, pts_feat, rep2)
            kpt3 = kpt3_raw + lax.stop_gradient(kpt2)
            rep3 = rep3_raw + lax.stop_gradient(rep2)
            bbox3 = to_bbox(rep3)

            outs.append({
                'cls': jnp.stack([cls1, cls2, cls3]),
                'kpt': jnp.stack([kpt1, kpt2, kpt3]),
                'bbox': jnp.stack([bbox1, bbox2, bbox3]),
            })
        return outs
