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
from jax import lax

from kgdet_tpu.models.layers import FrozenBatchNorm, he_normal_init, \
    max_pool_3x3_s2
from kgdet_tpu.ops.pallas_stem import stem_layer1_pipeline, \
    use_stem_pipeline

ARCH_SETTINGS = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


def _conv(features, k, s=1, name=None, groups=1, dtype=jnp.float32):
    # dtype matters: without it flax promotes bf16 activations to the f32
    # param dtype, so every trunk conv reads a converted f32 copy of its
    # input (2x HBM traffic on the heaviest convs in the model)
    return nn.Conv(features, (k, k), strides=(s, s), padding=[(k // 2,) * 2] * 2,
                   use_bias=False, kernel_init=he_normal_init(),
                   feature_group_count=groups, dtype=dtype, name=name)


class DeformConv3x3(nn.Module):
    """3x3 deformable conv (DCN-in-backbone option), any stride.

    Offsets predicted by a zero-init 3x3 conv (18 channels, y-first pairs)
    running at the same stride as the deform conv, added to the static base
    grid and fed to the shared deformable sampler. The param naming
    (conv_offset kernel/bias + tap-major weight) matches what
    utils/torch_convert maps conv2_offset/conv2 onto.
    (Parity: reference resnet.py:147-186 — DCN at conv2_stride, offsets
    from a stride-matched conv2_offset.)
    """
    features: int
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import numpy as np

        from kgdet_tpu.ops.deform import deform_conv, deform_sample

        B, H, W, C = x.shape
        offs = nn.Conv(18, (3, 3), strides=(self.stride, self.stride),
                       padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name='conv_offset')(x)
        Ho, Wo = offs.shape[1:3]
        base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing='ij'),
                        axis=-1).reshape(9, 2).astype(np.float32)
        rel = offs.reshape(B, Ho, Wo, 9, 2) + jnp.asarray(base)
        g = self.groups
        w = self.param('weight', he_normal_init(),
                       (9, C // g, self.features), jnp.float32)
        if g == 1:
            return deform_conv(x, rel, w.astype(self.dtype),
                               stride=self.stride)
        # grouped DCN (ResNeXt): one shared gather, block-diagonal MXU
        # contraction per channel group (torch grouped-conv weight layout:
        # output channel f serves group f // (F/g))
        samples = deform_sample(x, rel, stride=self.stride)  # (B, P, 9, C)
        P = samples.shape[1]
        F = self.features
        out = jnp.einsum(
            'bpkgc,kcgf->bpgf',
            samples.reshape(B, P, 9, g, C // g),
            w.astype(self.dtype).reshape(9, C // g, g, F // g))
        return out.reshape(B, Ho, Wo, F)


def s2d_stem_conv(x, w):
    """Exact width-packed rewrite of the 7x7/2 stem convolution.

    A stride-2 conv on 3-channel input runs the MXU at 3/128 contraction
    utilization. Regrouping horizontal pixel pairs into channels (a 6-channel
    8x4 conv at stride (2, 1)) is mathematically identical at the same
    contraction density as full 2x2 space-to-depth, but the input regrouping
    is a pure reshape — no 6-D transpose pass over the full-resolution image
    (measured ~3 ms/batch8 cheaper on v5e than the transpose variant, kept
    below for odd widths). The weight transform is applied at runtime from
    the original (7, 7, 3, 64) parameter, so torch checkpoint conversion is
    unaffected.
    """
    B, H, W, C = x.shape
    if W % 2:
        return _s2d_stem_transpose(x, w)
    O = w.shape[-1]
    # pad kernel to 8x8 (leading zero row/col = the unused phase slot), then
    # merge (kx-pair, pixel-parity, channel) -> 2C input channels per kx'
    w_pad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    wd = w_pad.reshape(8, 4, 2 * C, O)
    # pack width pairs into channels: (B, H, W/2, 2C) is a pure reshape
    xr = x.reshape(B, H, W // 2, 2 * C)
    # h pad 4/4 px (row -4 hits the kernel's zero row); w pad 2/2 packed
    # units = 4/4 px
    xr = jnp.pad(xr, ((0, 0), (4, 4), (2, 2), (0, 0)))
    y = lax.conv_general_dilated(
        xr, wd.astype(xr.dtype), (2, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y[:, :(H + 1) // 2, :W // 2]


def _s2d_stem_transpose(x, w):
    """Full 2x2 space-to-depth stem (12-channel 4x4/1 conv); handles odd
    widths that the reshape-only packing cannot express."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    w_pad = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = w_pad.reshape(4, 2, 4, 2, C, O)          # (k'y, py, k'x, px, c, o)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * C, O)
    # pad input so sampling starts at an even offset (-4; row -4 has w=0)
    xp = jnp.pad(x, ((0, 0), (4, 4 + H % 2), (4, 4 + W % 2), (0, 0)))
    Hp, Wp = H + 8 + H % 2, W + 8 + W % 2
    x2 = xp.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
    x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp // 2, Wp // 2, 4 * C)
    y = lax.conv_general_dilated(
        x2, w2.astype(x2.dtype), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return y[:, :(H + 1) // 2, :(W + 1) // 2]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.planes, 3, self.stride, 'conv1',
                    dtype=self.dtype)(x)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn1')(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, 'conv2', dtype=self.dtype)(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn2')(out)
        if self.downsample:
            identity = _conv(self.planes, 1, self.stride, 'downsample_conv',
                             dtype=self.dtype)(x)
            identity = FrozenBatchNorm(
                dtype=self.dtype, name='downsample_bn')(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """Bottleneck block, pytorch or caffe style.

    style='pytorch' puts the stage stride on the 3x3 conv; style='caffe'
    puts it on the first 1x1 (reference resnet.py:116-127), which caffe-era
    zoo checkpoints assume.

    Optional per-stage extras mirroring the reference ResNet's stage options
    (resnet.py dcn/gcb/gen_attention): use_dcn swaps the 3x3 for a
    deformable conv; plugin 'gen_attention' runs empirical attention after
    the 3x3 (resnet.py:243), 'gcb' adds the GCNet context block after bn3
    inside the residual branch (resnet.py:249), 'nonlocal' appends a
    NonLocal block after the residual add (extension; not a reference
    resnet insertion point).
    """
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    use_dcn: bool = False
    style: str = 'pytorch'
    plugin: Any = None     # None | 'gcb' | 'nonlocal' | 'gen_attention'
    # ResNeXt grouped-bottleneck knobs (reference backbones/resnext.py:
    # width = floor(planes * base_width / 64) * groups when groups > 1)
    groups: int = 1
    base_width: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64)) * self.groups
        c1s = self.stride if self.style == 'caffe' else 1
        c2s = 1 if self.style == 'caffe' else self.stride
        out = _conv(width, 1, c1s, 'conv1', dtype=self.dtype)(x)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn1')(out)
        out = nn.relu(out)
        if self.use_dcn:
            out = DeformConv3x3(width, stride=c2s, groups=self.groups,
                                dtype=self.dtype, name='conv2')(out)
        else:
            out = _conv(width, 3, c2s, 'conv2', groups=self.groups,
                        dtype=self.dtype)(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn2')(out)
        out = nn.relu(out)
        if self.plugin == 'gen_attention':
            from kgdet_tpu.models.plugins import GeneralizedAttention
            out = GeneralizedAttention(
                dtype=self.dtype, name='gen_attention_block')(out)
        out = _conv(self.planes * self.expansion, 1, 1, 'conv3',
                    dtype=self.dtype)(out)
        out = FrozenBatchNorm(dtype=self.dtype, name='bn3')(out)
        if self.plugin == 'gcb':
            from kgdet_tpu.models.plugins import ContextBlock
            out = ContextBlock(dtype=self.dtype, name='context_block')(out)
        if self.downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride,
                             'downsample_conv', dtype=self.dtype)(x)
            identity = FrozenBatchNorm(
                dtype=self.dtype, name='downsample_bn')(identity)
        out = nn.relu(out + identity)
        if self.plugin == 'nonlocal':
            from kgdet_tpu.models.plugins import NonLocal2D
            out = NonLocal2D(dtype=self.dtype, name='nonlocal_block')(out)
        return out


class _ConvKernel(nn.Module):
    """Declares a conv kernel param at the torch-compatible path without a
    flax Conv module, so FusedBottleneck can hand raw weights to the fused
    Pallas block kernel. Param tree is identical to nn.Conv's."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param('kernel', he_normal_init(), self.shape,
                          jnp.float32)


class _BNParams(nn.Module):
    """FrozenBatchNorm's params/stats at the same paths, returned raw."""
    ch: int

    @nn.compact
    def __call__(self):
        scale = self.param('scale', nn.initializers.ones, (self.ch,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.ch,),
                          jnp.float32)
        mean = self.variable('batch_stats', 'mean',
                             lambda: jnp.zeros((self.ch,), jnp.float32))
        var = self.variable('batch_stats', 'var',
                            lambda: jnp.ones((self.ch,), jnp.float32))
        return scale, bias, mean.value, var.value


class FusedBottleneck(nn.Module):
    """Frozen stride-1 bottleneck computed by one fused Pallas kernel
    (ops/pallas_resblock.py): inter-conv activations never touch HBM.
    layer1 is bandwidth bound (~4.7 GB of activation traffic per batch-8
    step against ~0.2 TFLOP of MXU work), so this is worth ~4 ms/step.

    Param tree is identical to Bottleneck's (conv1/bn1/.../downsample_*),
    so checkpoints, the converter, and the optimizer mask see no
    difference. Used by ResNet only for frozen stages (all operands are
    stop_gradient'ed — the fused kernel has no VJP; semantics match since
    frozen params take no updates and the stage output gradient is cut).
    Off-TPU (or for ineligible shapes) it computes the same folded-BN math
    with XLA convs.
    """
    planes: int
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fold_transposed=False, cin=None):
        from kgdet_tpu.ops.pallas_resblock import (
            bottleneck_reference, fold_bn, fused_bottleneck,
            use_fused_bottleneck)

        if x is not None:
            B, H, W, cin = x.shape
        width = self.planes
        cout = self.planes * 4
        k1 = _ConvKernel((1, 1, cin, width), name='conv1')()
        bn1 = _BNParams(width, name='bn1')()
        k2 = _ConvKernel((3, 3, width, width), name='conv2')()
        bn2 = _BNParams(width, name='bn2')()
        k3 = _ConvKernel((1, 1, width, cout), name='conv3')()
        bn3 = _BNParams(cout, name='bn3')()
        w1, b1 = fold_bn(k1[0, 0], *bn1)
        w2, b2 = fold_bn(k2, *bn2)
        w3, b3 = fold_bn(k3[0, 0], *bn3)
        if self.downsample:
            kd = _ConvKernel((1, 1, cin, cout), name='downsample_conv')()
            bnd = _BNParams(cout, name='downsample_bn')()
            wd, bd = fold_bn(kd[0, 0], *bnd)
        else:
            wd = bd = None
        if fold_transposed:
            # transposed-matmul weight dict for the whole-prefix pipeline
            # (ops/pallas_stem.py); same params, different contraction form
            from kgdet_tpu.ops.pallas_stem import transpose_folded
            return lax.stop_gradient(
                transpose_folded(w1, b1, w2, b2, w3, b3, wd, bd))
        args = lax.stop_gradient(
            (x.astype(self.dtype), w1, b1, w2, b2, w3, b3, wd, bd))
        if use_fused_bottleneck(H, W, cin, width, cout,
                                jnp.dtype(self.dtype).itemsize):
            return fused_bottleneck(*args)
        return bottleneck_reference(*args)


class _StemKernel(nn.Module):
    """Holds the stem conv kernel at the torch-compatible param path
    (backbone/conv1/kernel) for the space-to-depth stem."""

    @nn.compact
    def __call__(self):
        return self.param('kernel', he_normal_init(), (7, 7, 3, 64),
                          jnp.float32)


class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    # 0-based stage indices receiving the optional extras
    dcn_stages: Tuple[int, ...] = ()
    gcb_stages: Tuple[int, ...] = ()
    nonlocal_stages: Tuple[int, ...] = ()
    gen_attention_stages: Tuple[int, ...] = ()
    # 'pytorch' (stride on 3x3) | 'caffe' (stride on the first 1x1)
    style: str = 'pytorch'
    # grouped bottlenecks (ResNeXt); groups=1 is plain ResNet
    groups: int = 1
    base_width: int = 4
    # exact space-to-depth stem (see s2d_stem_conv); same params either way
    s2d_stem: bool = True
    # frozen-prefix gradient cut: stop_gradient after the last frozen stage
    # (0 = stem only, n = stem + layer1..n, matching reference
    # resnet.py:466-479 _freeze_stages). The optimizer mask
    # (parallel/train.py:frozen_param_mask) already zeroes these params'
    # updates; the cut additionally lets XLA skip the entire backward
    # through the frozen prefix — identical training semantics, ~30 ms less
    # backward work per full-size step.
    frozen_stages: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = BasicBlock if block_type == 'basic' else Bottleneck
        expansion = 1 if block_type == 'basic' else 4

        x = x.astype(self.dtype)
        # Whole-frozen-prefix pipeline (ops/pallas_stem.py): stem conv +
        # bn + relu + maxpool + all of layer1 as chained Pallas kernels in
        # one transposed interior layout — removes the stem's 6/128-lane
        # MXU waste and every inter-block XLA layout copy. Same param tree
        # (conv1/bn1/layer1/...); only for the fully frozen prefix, like
        # FusedBottleneck (no VJP).
        pipe_stage0 = (
            self.s2d_stem and block_cls is Bottleneck
            and not self.is_initializing()
            and self.frozen_stages >= 1 and self.num_stages >= 1
            and 0 not in self.dcn_stages and 0 not in self.gcb_stages
            and 0 not in self.nonlocal_stages
            and 0 not in self.gen_attention_stages and self.groups == 1
            and not self.is_mutable_collection('intermediates')
            and use_stem_pipeline(*x.shape[:3],
                                  jnp.dtype(self.dtype).itemsize))
        if pipe_stage0:
            from kgdet_tpu.ops.pallas_resblock import fold_bn
            stem_kernel = _StemKernel(name='conv1')()
            bn1 = _BNParams(64, name='bn1')()
            sw, sb = fold_bn(stem_kernel, *bn1)
            blocks = []
            in_c = 64
            for i in range(stage_blocks[0]):
                blocks.append(FusedBottleneck(
                    planes=64, downsample=(i == 0), dtype=self.dtype,
                    name=f'layer1/{i}')(None, fold_transposed=True,
                                        cin=in_c))
                in_c = 256
            x = stem_layer1_pipeline(*lax.stop_gradient((x, sw, sb)),
                                     blocks)
            x = lax.stop_gradient(x)
        elif self.s2d_stem:
            stem_kernel = _StemKernel(name='conv1')()
            x = s2d_stem_conv(x, stem_kernel)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        kernel_init=he_normal_init(), dtype=self.dtype,
                        name='conv1')(x)
        if not pipe_stage0:
            x = FrozenBatchNorm(dtype=self.dtype, name='bn1')(x)
            x = nn.relu(x)
            x = max_pool_3x3_s2(x)
            if self.frozen_stages == 0:
                x = lax.stop_gradient(x)

        outs = []
        planes = 64
        in_ch = 64
        for stage in range(self.num_stages):
            if stage == 0 and pipe_stage0:
                in_ch = 256
                if 0 in self.out_indices:
                    outs.append(x)
                planes *= 2
                continue
            stride = 1 if stage == 0 else 2
            num_blocks = stage_blocks[stage]
            plugin = ('gcb' if stage in self.gcb_stages else
                      'nonlocal' if stage in self.nonlocal_stages else
                      'gen_attention' if stage in self.gen_attention_stages
                      else None)
            use_dcn = stage in self.dcn_stages
            # Frozen stage-0 bottlenecks run as one fused Pallas kernel per
            # block (ops/pallas_resblock.py) — layer1 is HBM-bandwidth
            # bound. Same param tree as Bottleneck; the plain composition
            # is kept for calibration traces (which sow per-BN moments).
            fuse_stage = (block_cls is Bottleneck and stage == 0
                          and stride == 1 and not use_dcn and plugin is None
                          and self.groups == 1 and self.frozen_stages >= 1
                          and not self.is_mutable_collection('intermediates'))
            for i in range(num_blocks):
                s = stride if i == 0 else 1
                need_ds = (i == 0) and (s != 1 or in_ch != planes * expansion)
                if fuse_stage:
                    x = FusedBottleneck(planes=planes, downsample=need_ds,
                                        dtype=self.dtype,
                                        name=f'layer{stage + 1}/{i}')(x)
                    in_ch = planes * expansion
                    continue
                kwargs = {}
                if block_cls is Bottleneck:
                    kwargs = dict(use_dcn=use_dcn, plugin=plugin,
                                  style=self.style, groups=self.groups,
                                  base_width=self.base_width)
                x = block_cls(planes=planes, stride=s, downsample=need_ds,
                              dtype=self.dtype,
                              name=f'layer{stage + 1}/{i}', **kwargs)(x)
                in_ch = planes * expansion
            if stage + 1 == self.frozen_stages:
                x = lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)

    @staticmethod
    def stage_channels(depth):
        block_type, _ = ARCH_SETTINGS[depth]
        e = 1 if block_type == 'basic' else 4
        return [64 * e, 128 * e, 256 * e, 512 * e]

    @classmethod
    def from_config(cls, bcfg, dtype=jnp.float32, name='backbone'):
        """Build from a BackboneConfig (shared by every detector family)."""
        return cls(depth=bcfg.depth, num_stages=bcfg.num_stages,
                   out_indices=bcfg.out_indices, dcn_stages=bcfg.dcn_stages,
                   gcb_stages=bcfg.gcb_stages,
                   nonlocal_stages=bcfg.nonlocal_stages,
                   gen_attention_stages=bcfg.gen_attention_stages,
                   style=bcfg.style, groups=bcfg.groups,
                   base_width=bcfg.base_width,
                   frozen_stages=bcfg.frozen_stages, dtype=dtype, name=name)


class ResNeXt(ResNet):
    """Grouped-bottleneck ResNeXt (reference backbones/resnext.py:1-90):
    identical topology to ResNet with width = floor(planes*base_width/64) *
    groups on the 3x3 (grouped) conv. Registered separately so configs can
    say type='ResNeXt' like the reference registry does."""
    groups: int = 32
    base_width: int = 4

    @classmethod
    def from_config(cls, bcfg, dtype=jnp.float32, name='backbone'):
        # BackboneConfig groups=1 means "unset" for ResNeXt: fall back to
        # the canonical 32x4d recipe
        groups = bcfg.groups if bcfg.groups != 1 else 32
        return cls(depth=bcfg.depth, num_stages=bcfg.num_stages,
                   out_indices=bcfg.out_indices, dcn_stages=bcfg.dcn_stages,
                   gcb_stages=bcfg.gcb_stages,
                   nonlocal_stages=bcfg.nonlocal_stages,
                   gen_attention_stages=bcfg.gen_attention_stages,
                   style=bcfg.style, groups=groups,
                   base_width=bcfg.base_width,
                   frozen_stages=bcfg.frozen_stages, dtype=dtype, name=name)
