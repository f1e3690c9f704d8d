"""Semantic parity against the reference's OWN torch modules.

The strongest mAP-parity evidence obtainable without the external
KGDet_epoch-12.pth: import the reference's actual code —
`mmdet/models/backbones/resnet.py`, `necks/fpn2.py`, and the KGDet cascade
head `anchor_heads/reppoints_head_kp3rep_cas_1_assign_once.py` — from
/root/reference (behind a minimal mmcv/mmdet shim and a pure-torch
DeformConv with deform_conv_cuda_kernel.cu:84-114 bilinear semantics),
initialize the torch modules, convert the weights through the production
converter (`utils/torch_convert.convert_state_dict`), and assert activation
parity of the flax stack at every boundary: C2-C5, all selected FPN levels,
and every stage's cls/keypoint/bbox outputs of the full cascade head.

This catches the class of bug converter round trips and single-layer tests
cannot: a wrong offset convention, GN grouping, moment-transform sign,
top-down interpolation order, or residual detach placement.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax.numpy as jnp  # noqa: E402

REF = '/root/reference/mmdetection/mmdet'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason='reference tree not mounted')


# --------------------------------------------------------------------------
# Pure-torch DeformConv: exact semantics of the reference CUDA op
# (deformable_im2col, deform_conv_cuda_kernel.cu:84-114,188-245): per output
# pixel (h, w) and kernel tap (i, j), sample the input bilinearly at
# (h*stride - pad + i*dil + dy, w*stride - pad + j*dil + dx) with
# out-of-bounds corners contributing zero, then contract with the conv
# weight. Offsets are y-first interleaved per tap (channel 2k = dy).
# --------------------------------------------------------------------------
class PureTorchDeformConv(torch.nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, deformable_groups=1,
                 bias=False):
        super().__init__()
        assert groups == 1 and deformable_groups == 1 and not bias
        k = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
            else tuple(kernel_size)
        self.kernel_size = k
        self.stride, self.padding, self.dilation = stride, padding, dilation
        self.weight = torch.nn.Parameter(
            torch.empty(out_channels, in_channels, *k))
        # NOTE: no .bias attribute at all — the reference DeformConv has
        # none, and mmcv normal_init branches on hasattr(module, 'bias')

    def forward(self, x, offset):
        B, C, H, W = x.shape
        kh, kw = self.kernel_size
        s, p, d = self.stride, self.padding, self.dilation
        Ho = (H + 2 * p - (d * (kh - 1) + 1)) // s + 1
        Wo = (W + 2 * p - (d * (kw - 1) + 1)) // s + 1
        K = kh * kw
        off = offset.view(B, K, 2, Ho, Wo)
        ys = torch.arange(Ho, dtype=x.dtype) * s - p
        xs = torch.arange(Wo, dtype=x.dtype) * s - p
        ky = (torch.arange(kh, dtype=x.dtype) * d).repeat_interleave(kw)
        kx = (torch.arange(kw, dtype=x.dtype) * d).repeat(kh)
        py = ys.view(1, 1, Ho, 1) + ky.view(1, K, 1, 1) + off[:, :, 0]
        px = xs.view(1, 1, 1, Wo) + kx.view(1, K, 1, 1) + off[:, :, 1]
        y0, x0 = py.floor(), px.floor()
        ly, lx = py - y0, px - x0
        flat = x.reshape(B, C, H * W)
        cols = x.new_zeros(B, C, K, Ho, Wo)
        for dy in (0, 1):
            for dx in (0, 1):
                yy, xx = y0 + dy, x0 + dx
                w = (ly if dy else 1 - ly) * (lx if dx else 1 - lx)
                valid = (yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1)
                idx = (yy.clamp(0, H - 1) * W + xx.clamp(0, W - 1)).long()
                v = flat.gather(2, idx.view(B, 1, -1).expand(B, C, -1))
                cols = cols + (w * valid).unsqueeze(1) \
                    * v.view(B, C, K, Ho, Wo)
        return torch.einsum('fck,bckhw->bfhw',
                            self.weight.view(self.weight.shape[0], C, K),
                            cols)


def test_pure_torch_deformconv_matches_plain_conv():
    """With zero offsets a DeformConv IS a plain conv — pin the shim itself
    before using it as the oracle's sampling op."""
    torch.manual_seed(0)
    x = torch.randn(2, 6, 9, 11)
    dc = PureTorchDeformConv(6, 4, 3, 1, 1)
    torch.nn.init.normal_(dc.weight, std=0.1)
    off = torch.zeros(2, 18, 9, 11)
    ref = torch.nn.functional.conv2d(x, dc.weight, padding=1)
    got = dc(x, off)
    np.testing.assert_allclose(got.detach().numpy(), ref.detach().numpy(),
                               rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# Shim + loader: the reference modules import mmcv.cnn (init helpers),
# mmcv.runner.load_checkpoint, mmdet.core/ops/registry/builder/plugins; the
# real `mmdet/models/utils` package (ConvModule, build_norm_layer, ConvWS)
# only needs mmcv.cnn, so it is loaded from the reference unmodified.
# --------------------------------------------------------------------------
def _load_module(name, path, search=None):
    spec = importlib.util.spec_from_file_location(
        name, path, submodule_search_locations=search)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref_modules():
    added = []

    def pkg(name):
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules[name] = mod
        added.append(name)
        return mod

    try:
        # mmcv.cnn init helpers (real-mmcv semantics: bias init only when a
        # non-None bias exists; the reference's vendored copy in
        # models/utils/weight_init.py is not None-safe)
        mmcv = pkg('mmcv')
        cnn = pkg('mmcv.cnn')
        mmcv.cnn = cnn

        def _bias(module, bias):
            if getattr(module, 'bias', None) is not None:
                torch.nn.init.constant_(module.bias, bias)

        def kaiming_init(module, mode='fan_out', nonlinearity='relu',
                         bias=0, distribution='normal'):
            init = torch.nn.init.kaiming_uniform_ \
                if distribution == 'uniform' else torch.nn.init.kaiming_normal_
            init(module.weight, mode=mode, nonlinearity=nonlinearity)
            _bias(module, bias)

        def xavier_init(module, gain=1, bias=0, distribution='normal'):
            init = torch.nn.init.xavier_uniform_ \
                if distribution == 'uniform' else torch.nn.init.xavier_normal_
            init(module.weight, gain=gain)
            _bias(module, bias)

        def normal_init(module, mean=0, std=1, bias=0):
            torch.nn.init.normal_(module.weight, mean, std)
            _bias(module, bias)

        def uniform_init(module, a=0, b=1, bias=0):
            torch.nn.init.uniform_(module.weight, a, b)
            _bias(module, bias)

        def constant_init(module, val, bias=0):
            torch.nn.init.constant_(module.weight, val)
            _bias(module, bias)

        cnn.kaiming_init = kaiming_init
        cnn.xavier_init = xavier_init
        cnn.normal_init = normal_init
        cnn.uniform_init = uniform_init
        cnn.constant_init = constant_init
        runner = pkg('mmcv.runner')
        mmcv.runner = runner
        runner.load_checkpoint = lambda *a, **k: None

        mmdet = pkg('mmdet')
        core = pkg('mmdet.core')
        core.auto_fp16 = lambda *a, **k: (lambda fn: fn)
        core.PointGenerator = type('PointGenerator', (), {})
        core.multi_apply = None
        core.multiclass_nms_kp = None
        core.point_target_kp = None
        ops = pkg('mmdet.ops')
        ops.DeformConv = PureTorchDeformConv
        ops.ModulatedDeformConv = type('ModulatedDeformConv', (), {})
        ops.ContextBlock = type('ContextBlock', (), {})
        models = pkg('mmdet.models')
        plugins = pkg('mmdet.models.plugins')
        plugins.GeneralizedAttention = type('GeneralizedAttention', (), {})

        class _Registry:
            def register_module(self, cls):
                return cls

        reg = pkg('mmdet.models.registry')
        reg.BACKBONES = _Registry()
        reg.NECKS = _Registry()
        reg.HEADS = _Registry()
        builder = pkg('mmdet.models.builder')
        builder.build_loss = lambda cfg: torch.nn.Identity()

        # the REAL utils package (ConvModule/ConvWS/build_norm_layer/...)
        _load_module('mmdet.models.utils',
                     f'{REF}/models/utils/__init__.py',
                     search=[f'{REF}/models/utils'])
        added.append('mmdet.models.utils')

        pkg('mmdet.models.backbones')
        resnet = _load_module('mmdet.models.backbones.resnet',
                              f'{REF}/models/backbones/resnet.py')
        added.append('mmdet.models.backbones.resnet')
        pkg('mmdet.models.necks')
        fpn2 = _load_module('mmdet.models.necks.fpn2',
                            f'{REF}/models/necks/fpn2.py')
        added.append('mmdet.models.necks.fpn2')
        pkg('mmdet.models.anchor_heads')
        head = _load_module(
            'mmdet.models.anchor_heads.kp3rep',
            f'{REF}/models/anchor_heads/'
            f'reppoints_head_kp3rep_cas_1_assign_once.py')
        added.append('mmdet.models.anchor_heads.kp3rep')
        yield resnet, fpn2, head
    finally:
        for name in added:
            sys.modules.pop(name, None)
        # drop any utils submodules the package import pulled in
        for name in list(sys.modules):
            if name.startswith('mmdet.models.utils.'):
                sys.modules.pop(name, None)


# --------------------------------------------------------------------------
# One torch reference stack + one converted flax stack, built once
# (kgdet_moment_r50_fpn_1x-deepfashion2.py model settings, f32, eval mode).
# --------------------------------------------------------------------------
@pytest.fixture(scope='module')
def stacks(ref_modules):
    resnet_mod, fpn2_mod, head_mod = ref_modules
    torch.manual_seed(0)
    norm_cfg = dict(type='GN', num_groups=32, requires_grad=True)

    backbone = resnet_mod.ResNet(depth=50, num_stages=4,
                                 out_indices=(0, 1, 2, 3), frozen_stages=1,
                                 style='pytorch')
    backbone.init_weights(pretrained=None)
    neck = fpn2_mod.FPN2(in_channels=[256, 512, 1024, 2048],
                         out_channels=256, start_level=1, end_level=-1,
                         add_extra_convs=True, num_outs=5, select_out=[2],
                         norm_cfg=norm_cfg)
    neck.init_weights()
    head = head_mod.RepPointsHeadKp3RepCas1AssignOnce(
        num_classes=14, in_channels=256, feat_channels=256,
        point_feat_channels=256, stacked_convs=3, num_keypts=294,
        gradient_mul=0.1, point_strides=[32], point_base_scale=4,
        norm_cfg=norm_cfg)
    head.init_weights()

    # non-trivial weights everywhere the default init is degenerate:
    # BN running stats (0/1), GN affine (1/0), zero biases
    gen = torch.Generator().manual_seed(7)
    for mod in (backbone, neck, head):
        for m in mod.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.2, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
            if isinstance(m, torch.nn.GroupNorm):
                m.weight.data.normal_(1.0, 0.1, generator=gen)
                m.bias.data.normal_(0.0, 0.1, generator=gen)
        mod.eval()

    # through the production converter, exactly as load_pth would
    state = {}
    for prefix, mod in (('backbone', backbone), ('neck', neck),
                        ('bbox_head', head)):
        for k, v in mod.state_dict().items():
            state[f'{prefix}.{k}'] = v
    from kgdet_tpu.utils.torch_convert import convert_state_dict
    params, stats, skipped = convert_state_dict(state)
    assert not skipped, skipped
    return dict(backbone=backbone, neck=neck, head=head,
                params=params, stats=stats)


@pytest.fixture(scope='module')
def acts(stacks):
    """Run both stacks once on a fixed image; cache every boundary."""
    from kgdet_tpu.config import KGDetConfig
    from kgdet_tpu.models.detector import build_backbone, build_neck
    from kgdet_tpu.models.families import get_head_family

    cfg = KGDetConfig()
    rng = np.random.RandomState(0)
    x = rng.randn(1, 96, 128, 3).astype(np.float32)

    with torch.no_grad():
        t_feats = stacks['backbone'](torch.tensor(x).permute(0, 3, 1, 2))
        t_necks = stacks['neck'](t_feats)
        t_head = stacks['head'].forward_single(t_necks[0])

    params, stats = stacks['params'], stacks['stats']
    f_backbone = build_backbone(cfg, jnp.float32)
    f_feats = f_backbone.apply(
        {'params': params['backbone'], 'batch_stats': stats['backbone']},
        jnp.asarray(x))
    f_neck = build_neck(cfg, jnp.float32)
    f_necks = f_neck.apply({'params': params['neck']}, f_feats)
    f_head = get_head_family(cfg.head.type).build(cfg, jnp.float32)
    f_out = f_head.apply({'params': params['head']}, list(f_necks))[0]
    return dict(t_feats=t_feats, t_necks=t_necks, t_head=t_head,
                f_feats=f_feats, f_necks=f_necks, f_head=f_out)


def _close(flax_nhwc, torch_nchw, tol=1e-4, label=''):
    a = np.asarray(flax_nhwc, np.float64)
    b = torch_nchw.detach().numpy().transpose(0, 2, 3, 1).astype(np.float64)
    assert a.shape == b.shape, (label, a.shape, b.shape)
    scale = max(1.0, float(np.abs(b).max()))
    err = float(np.abs(a - b).max()) / scale
    assert err <= tol, f'{label}: max rel-to-scale err {err:.3e} > {tol}'


def test_backbone_parity(acts):
    """C2-C5 of the reference resnet.py:332-525 vs models/resnet.py."""
    for i, name in enumerate(('C2', 'C3', 'C4', 'C5')):
        _close(acts['f_feats'][i], acts['t_feats'][i], label=name)


def test_neck_parity(acts):
    """FPN2 select_out (fpn2.py:102-141) vs models/fpn.py."""
    assert len(acts['f_necks']) == len(acts['t_necks']) == 1
    _close(acts['f_necks'][0], acts['t_necks'][0], label='P5(select_out=2)')


def test_head_parity(acts):
    """All three cascade stages' cls/keypoint/bbox outputs
    (reppoints_head_kp3rep_cas_1_assign_once.py:125-179,412-446) vs
    models/kgdet_head.py — covers the stage-1 pure-conv path, both
    deformable stages (offset convention incl. the dcn_base round trip),
    the residual accumulation, and the moment points2bbox transform."""
    t = acts['t_head']   # (cls1..3, kpt1..3, bbox1..3)
    f = acts['f_head']   # {'cls': (3,B,H,W,C), 'kpt': ..., 'bbox': ...}
    for s in range(3):
        _close(f['cls'][s], t[s], label=f'cls_s{s + 1}')
        _close(f['kpt'][s], t[3 + s], label=f'kpt_s{s + 1}')
        # bbox tolerance: points2bbox deliberately computes
        # sqrt(var + 1e-6) (gradient safety at collapsed point sets,
        # ops/points.py) where the reference uses torch.std exactly; at
        # the ~0.01 stds of a fresh init that eps alone shifts the
        # half-extent by ~5e-5 — a documented deviation, not a
        # conversion/semantics bug (cls/kpt above stay at 1e-4)
        _close(f['bbox'][s], t[6 + s], tol=5e-4, label=f'bbox_s{s + 1}')
