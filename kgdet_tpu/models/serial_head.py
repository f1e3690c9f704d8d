"""Serial / Parallel keypoint RepPoints heads (init + refine, 5-level FPN).

Two-stage variants of the KGDet idea:
- Serial: init stage predicts 294 keypoints with a 3x3 conv; the 9-point
  RepPoints field is a 1x1 conv OF the keypoints ("serial"); the refine stage
  samples cls/kpt features with a single 3x3 deformable conv at the init
  RepPoints, outputs accumulating residually (init detached).
- Parallel: identical except the RepPoints fields (init and refine) come from
  independent conv branches instead of the keypoint field.

TPU-first: the refine deformable convs of both branches share one
deform_sample gather over channel-concatenated features; 1x1 convs are Dense.

Parity references: /root/reference/mmdetection/mmdet/models/anchor_heads/
reppoints_head_kp_serial.py:117-340 and reppoints_head_kp_parallel.py:117-342.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from kgdet_tpu.models.layers import ConvModule, bias_init_with_prob, \
    normal_init
from kgdet_tpu.ops.deform import deform_conv_from_samples, deform_sample, \
    grad_multiply
from kgdet_tpu.ops.points import points2bbox


class SerialKpHead(nn.Module):
    """Init/refine keypoint head; ``parallel=True`` selects the Parallel
    variant.

    Returns per level a dict of stage-stacked tensors:
      cls:  (1, B, H, W, num_classes)   refine-stage logits
      kpt:  (2, B, H, W, 294*2)         init, refine (y-first offset pairs)
      bbox: (2, B, H, W, 4)             decoded boxes per stage
      rep:  (2, B, H, W, num_reppts*2)  raw RepPoints offset fields
    """
    num_classes: int = 13
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_keypts: int = 294
    num_reppts: int = 9
    gradient_mul: float = 0.1
    point_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    transform_method: str = 'moment'
    moment_mul: float = 0.01
    parallel: bool = False
    # False = plain upstream RepPoints (no keypoint branch; RepPoints fields
    # from their own convs, parity: mmdet reppoints_head.py)
    with_keypoints: bool = True
    norm: Optional[str] = 'gn'
    gn_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        assert len(feats) == len(self.point_strides)
        kpt_dim = 2 * self.num_keypts
        rep_dim = 2 * self.num_reppts
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

        dense = lambda feats_, name, bias_init=nn.initializers.zeros: \
            nn.Dense(feats_, kernel_init=normal_init(0.01),
                     bias_init=bias_init, dtype=self.dtype, name=name)
        conv3 = lambda name: nn.Conv(
            self.point_feat_channels, (3, 3), padding='SAME',
            kernel_init=normal_init(0.01), dtype=self.dtype, name=name)

        with_kp = self.with_keypoints
        own_rep_branch = self.parallel or not with_kp
        if with_kp:
            keypts_init_conv = conv3('keypts_init_conv')
            keypts_init_out = dense(kpt_dim, 'keypts_init_out')
            keypts_refine_out = dense(kpt_dim, 'keypts_refine_out')
        if own_rep_branch:
            reppts_init_conv = conv3('reppts_init_conv')
        reppts_init_out = dense(rep_dim, 'reppts_init_out')
        cls_refine_out = dense(self.num_classes, 'cls_refine_out',
                               bias_init_with_prob(0.01))
        reppts_refine_out = dense(rep_dim, 'reppts_refine_out')

        C = self.feat_channels
        F = self.point_feat_channels
        w_cls = self.param('cls_refine_dfmconv', normal_init(0.01),
                           (self.num_reppts, C, F), jnp.float32)
        if with_kp:
            w_kpt = self.param('keypts_refine_dfmconv', normal_init(0.01),
                               (self.num_reppts, C, F), jnp.float32)
        if own_rep_branch:
            w_rep = self.param('reppts_refine_dfmconv', normal_init(0.01),
                               (self.num_reppts, C, F), jnp.float32)

        def to_bbox(rep):
            return points2bbox(rep.astype(jnp.float32),
                               self.transform_method, moment_transfer,
                               self.moment_mul)

        outs = []
        for x in feats:
            B, H, W, _ = x.shape
            cls_feat = x
            pts_feat = x
            for conv in towers[0]:
                cls_feat = conv(cls_feat)
            for conv in towers[1]:
                pts_feat = conv(pts_feat)

            flat = lambda t: t.reshape(B, H * W, -1)
            unflat = lambda t: t.reshape(B, H, W, -1)

            if with_kp:
                kpt_init = keypts_init_out(
                    nn.relu(keypts_init_conv(pts_feat)))
            else:
                kpt_init = jnp.zeros((B, H, W, kpt_dim), self.dtype)
            if own_rep_branch:
                rep_init = reppts_init_out(
                    nn.relu(reppts_init_conv(pts_feat)))
            else:
                rep_init = reppts_init_out(kpt_init)

            offs = grad_multiply(rep_init, self.gradient_mul)
            offs = offs.reshape(B, H, W, self.num_reppts, 2)
            from kgdet_tpu.ops.deform import absolute_positions
            from kgdet_tpu.ops.pallas_deform import use_fused_deform
            n_pts_br = int(with_kp) + int(own_rep_branch)
            if use_fused_deform(H * W, C, self.num_reppts,
                                F * max(n_pts_br, 1),
                                cls_feat.dtype.itemsize):
                # fused gather+contract per branch; the two pts-feature
                # branches (kpt/rep) share one call via weight concat, so
                # total gather traffic matches the shared-sample path while
                # the 9-tap columns never touch HBM
                from kgdet_tpu.ops.pallas_deform import deform_conv_fused
                pos = absolute_positions(offs, H, W)
                cls_col = nn.relu(deform_conv_fused(
                    cls_feat, pos, w_cls.astype(self.dtype)))
                kpt_col = rep_col = None
                if n_pts_br:
                    w_parts = ([w_kpt] if with_kp else []) \
                        + ([w_rep] if own_rep_branch else [])
                    w_cat = jnp.concatenate(
                        [w.astype(self.dtype) for w in w_parts], axis=-1)
                    pts_col = nn.relu(deform_conv_fused(
                        pts_feat, pos, w_cat))
                    if with_kp:
                        kpt_col = pts_col[..., :F]
                    if own_rep_branch:
                        rep_col = pts_col[..., F if with_kp else 0:]
            else:
                cat = jnp.concatenate([cls_feat, pts_feat], axis=-1)
                samples = deform_sample(cat, offs)   # (B, P, 9, 2C)
                cls_col = nn.relu(deform_conv_from_samples(
                    samples[..., :C], w_cls.astype(self.dtype)))
                kpt_col = nn.relu(deform_conv_from_samples(
                    samples[..., C:], w_kpt.astype(self.dtype))) \
                    if with_kp else None
                rep_col = nn.relu(deform_conv_from_samples(
                    samples[..., C:], w_rep.astype(self.dtype))) \
                    if own_rep_branch else None

            cls_out = unflat(cls_refine_out(cls_col))
            if with_kp:
                kpt_ref_raw = unflat(keypts_refine_out(kpt_col))
            else:
                kpt_ref_raw = jnp.zeros((B, H, W, kpt_dim), self.dtype)
            if own_rep_branch:
                rep_ref_raw = unflat(reppts_refine_out(rep_col))
            else:
                rep_ref_raw = unflat(reppts_refine_out(
                    flat(kpt_ref_raw)))
            kpt_refine = kpt_ref_raw + lax.stop_gradient(kpt_init)
            rep_refine = rep_ref_raw + lax.stop_gradient(rep_init)

            outs.append({
                'cls': jnp.stack([cls_out]),
                'kpt': jnp.stack([kpt_init, kpt_refine]),
                'bbox': jnp.stack([to_bbox(rep_init), to_bbox(rep_refine)]),
                'rep': jnp.stack([rep_init, rep_refine]),
            })
        return outs
