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
import numpy as np
from jax import lax

from kgdet_tpu.models.layers import ConvModule, bias_init_with_prob, \
    normal_init
from kgdet_tpu.ops.deform import deform_conv_from_samples, deform_sample, \
    grad_multiply
from kgdet_tpu.ops.points import points2bbox

# tap-count layout of the three deformable columns (3x3, 5x5, 7x7)
COLUMN_TAPS = (9, 25, 49)
NUM_REPPTS = sum(COLUMN_TAPS)  # 83


def _dfm_param_name(branch: str, taps, ci: int) -> str:
    """Reference-compatible DCN weight names: multi-column heads suffix the
    kernel size (cls_dfmconv_3/5/7); the single-column Kp1Rep head does not
    (reference reppoints_head_kp1rep_cas_1_assign_once.py:49-57)."""
    if len(taps) == 1:
        return f'{branch}_dfmconv'
    ksz = int(taps[ci] ** 0.5)
    return f'{branch}_dfmconv_{ksz}'


class KpRepBlock(nn.Module):
    """One cascade stage: (cls logits, keypoint offsets, reppoint offsets)."""
    deform: bool
    cls_out_channels: int
    feat_channels: int = 256
    num_keypts: int = 294
    gradient_mul: float = 0.1
    column_taps: Tuple[int, ...] = COLUMN_TAPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cls_feat, pts_feat, reppts_offset=None):
        kpt_dim = 2 * self.num_keypts
        num_reppts = sum(self.column_taps)
        rep_dim = 2 * num_reppts
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
        offs = offs.reshape(B, H, W, num_reppts, 2)  # (dy, dx) per tap

        # one gather for both branches and all columns, outputs split per
        # (column, branch) so each contraction is exact-FLOPs and no
        # slicing (= whole-tensor copies) happens between gather and MXU
        F = self.feat_channels
        taps = self.column_taps
        weights = {
            branch: [
                self.param(_dfm_param_name(branch, taps, ci),
                           normal_init(0.01), (k, C, F),
                           jnp.float32).astype(self.dtype)
                for ci, k in enumerate(taps)
            ]
            for branch in ('cls', 'keypts')
        }
        from kgdet_tpu.ops.deform import absolute_positions, \
            use_pallas_sampling
        from kgdet_tpu.ops.pallas_deform import use_fused_deform
        pos = absolute_positions(offs, H, W)
        if use_fused_deform(H * W, C, max(taps), F,
                            cls_feat.dtype.itemsize):
            # dual path: inference runs one fused gather+MXU kernel per
            # (column, branch) with the columns never touching HBM; under
            # differentiation the custom_vjp forward rule gathers all taps
            # once with the shared split kernel and the backward runs ONE
            # fused gradient kernel over the cls|pts concat
            from kgdet_tpu.ops.pallas_deform import deform_columns_dual
            dt = cls_feat.dtype
            cls_cat, kpt_cat = deform_columns_dual(
                cls_feat, pts_feat, pos,
                tuple(w.astype(dt) for w in weights['cls']),
                tuple(w.astype(dt) for w in weights['keypts']),
                tuple(taps))
            cls_cat = nn.relu(cls_cat)                 # (B, P, 3F)
            kpt_cat = nn.relu(kpt_cat)
        else:
            if use_pallas_sampling((H, W, 2 * C), cls_feat.dtype.itemsize,
                                   allow_tiling=False) \
                    and C % 128 == 0:
                from kgdet_tpu.ops.pallas_deform import deform_sample_split
                cols = deform_sample_split(cls_feat, pts_feat, pos, taps)
            else:
                from kgdet_tpu.ops.pallas_deform import _split_xla
                cols = _split_xla(cls_feat, pts_feat, pos, taps)
            cls_cat = jnp.concatenate([
                nn.relu(deform_conv_from_samples(c, weights['cls'][i]))
                for i, (c, _) in enumerate(cols)], axis=-1)
            kpt_cat = jnp.concatenate([
                nn.relu(deform_conv_from_samples(p, weights['keypts'][i]))
                for i, (_, p) in enumerate(cols)], axis=-1)
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
    column_taps: Tuple[int, ...] = COLUMN_TAPS
    # horizontal flip-ensembled forward (TTA; reference forward_single_flip,
    # off by default). flip_indices: 2K-channel permutation remapping the
    # interleaved keypoint-offset channels after a flip (None = identity).
    flip_forward: bool = False
    flip_indices: Optional[Tuple[int, ...]] = None
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
                       gradient_mul=self.gradient_mul,
                       column_taps=self.column_taps, dtype=self.dtype,
                       name=f'kp_rep_block_{i + 1}')
            for i in range(3)
        ]

        def to_bbox(reppts):
            return points2bbox(
                reppts.astype(jnp.float32), self.transform_method,
                moment_transfer, self.moment_mul)

        def run_level(x):
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

            return {
                'cls': jnp.stack([cls1, cls2, cls3]),
                'kpt': jnp.stack([kpt1, kpt2, kpt3]),
                'bbox': jnp.stack([bbox1, bbox2, bbox3]),
            }

        def fuse_flip(out, out_f):
            """Average with the flipped-input forward mapped back.

            Parity: forward_single_flip (reference head :448-488) — cls maps
            flip back on W; keypoint offsets (y-first pairs) flip back,
            negate x, permute channels by flip_indices; boxes flip back,
            negate x, swap x1/x2.
            """
            K2 = out['kpt'].shape[-1]
            flip_idx = jnp.asarray(
                self.flip_indices if self.flip_indices is not None
                else np.arange(K2), jnp.int32)
            cls_b = out_f['cls'][:, :, :, ::-1]
            kpt_b = out_f['kpt'][:, :, :, ::-1]
            sign = jnp.tile(jnp.asarray([1.0, -1.0], kpt_b.dtype), K2 // 2)
            kpt_b = (kpt_b * sign)[..., flip_idx]
            bbox_b = out_f['bbox'][:, :, :, ::-1]
            bbox_b = jnp.stack(
                [-bbox_b[..., 2], bbox_b[..., 1],
                 -bbox_b[..., 0], bbox_b[..., 3]], axis=-1)
            return {
                'cls': (out['cls'] + cls_b) / 2,
                'kpt': (out['kpt'] + kpt_b) / 2,
                'bbox': (out['bbox'] + bbox_b) / 2,
            }

        outs = []
        for x in feats:
            out = run_level(x)
            if self.flip_forward:
                out = fuse_flip(out, run_level(x[:, :, ::-1]))
            outs.append(out)
        return outs
