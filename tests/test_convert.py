"""Checkpoint converter tests: name mapping, layout transposes, conv parity."""
import numpy as np
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.utils.torch_convert import (
    convert_state_dict, merge_into_variables)
from tests.common import tiny_cfg

torch = pytest.importorskip('torch')


def _flax_to_torch_state(variables):
    """Inverse mapping: build a torch-style state dict from flax variables."""
    state = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                emit(path + [k], np.asarray(v))

    def emit(path, v):
        comp = path[0]
        if comp == 'backbone':
            if path[1].startswith(('features_', 'extra_')):
                # SSDVGG trunk: features.N / extra.N convs
                kind, idx = path[1].rsplit('_', 1)
                leaf = 'weight' if path[2] == 'kernel' else 'bias'
                val = _t_conv(v) if path[2] == 'kernel' else torch.tensor(v)
                state[f'backbone.{kind}.{idx}.{leaf}'] = val
                return
            if path[1] == 'l2_norm':
                state['backbone.l2_norm.weight'] = torch.tensor(v)
                return
            # all other backbone params are conv kernels or bn scale/bias
            name = '.'.join(p.replace('/', '.') for p in path[1:])
            leaf = path[-1]
            if leaf == 'kernel':
                tname = name[:-len('.kernel')].replace(
                    'downsample_conv', 'downsample.0')
                state[f'backbone.{tname}.weight'] = _t_conv(v)
            else:
                tname = name.rsplit('.', 1)[0].replace(
                    'downsample_bn', 'downsample.1')
                tleaf = 'weight' if leaf == 'scale' else 'bias'
                state[f'backbone.{tname}.{tleaf}'] = torch.tensor(v)
        elif comp == 'neck':
            kind, idx = path[1].rsplit('_', 1)
            mod = path[2]
            leaf = path[3]
            if mod == 'conv':
                val = _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                state[f'neck.{kind}_convs.{idx}.conv.'
                      f'{"weight" if leaf == "kernel" else "bias"}'] = val
            else:
                state[f'neck.{kind}_convs.{idx}.gn.'
                      f'{"weight" if leaf == "scale" else "bias"}'] = \
                    torch.tensor(v)
        elif comp == 'head':
            if path[1] == 'moment_transfer':
                state['bbox_head.moment_transfer'] = torch.tensor(v)
                return
            if path[1] == 'scales':
                for i, s in enumerate(np.asarray(v).reshape(-1)):
                    state[f'bbox_head.scales.{i}.scale'] = torch.tensor(
                        np.asarray([s], np.float32))
                return
            if 'dfmconv' in path[1]:
                # serial/parallel refine DCN weights live directly on the
                # head (reppoints_head_kp_serial.py:143-170)
                state[f'bbox_head.{path[1]}.weight'] = _t_dcn(v)
                return
            if path[1].endswith(('_init_out', '_refine_out')):
                leaf = path[2]
                if leaf == 'kernel':
                    w = np.transpose(v, (1, 0))[:, :, None, None]
                    state[f'bbox_head.{path[1]}.weight'] = torch.tensor(w)
                else:
                    state[f'bbox_head.{path[1]}.bias'] = torch.tensor(v)
                return
            if path[1] in ('keypts_init_conv', 'reppts_init_conv',
                           'fcos_cls', 'fcos_reg', 'fcos_centerness',
                           'retina_cls', 'retina_reg', 'conv_loc',
                           'conv_shape'):
                leaf = path[2]
                val = _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                state[f'bbox_head.{path[1]}.'
                      f'{"weight" if leaf == "kernel" else "bias"}'] = val
                return
            if path[1].startswith('feature_adaption'):
                if path[2] == 'conv_adaption':
                    state[f'bbox_head.{path[1]}.conv_adaption.weight'] = \
                        _t_dcn(v)
                else:
                    state[f'bbox_head.{path[1]}.conv_offset.weight'] = \
                        _t_conv(v)
                return
            if path[1].startswith(('cls_convs_', 'reg_convs_')):
                kind, idx = path[1].rsplit('_', 1)
                if path[2] in ('kernel', 'bias'):
                    # SSD per-level conv lists (no ConvModule wrapper)
                    leaf = path[2]
                    val = _t_conv(v) if leaf == 'kernel' \
                        else torch.tensor(v)
                    state[f'bbox_head.{kind}.{idx}.'
                          f'{"weight" if leaf == "kernel" else "bias"}'] = \
                        val
                    return
                mod, leaf = path[2], path[3]
                if mod == 'conv':
                    val = _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                    state[f'bbox_head.{kind}.{idx}.conv.'
                          f'{"weight" if leaf == "kernel" else "bias"}'] = val
                else:
                    state[f'bbox_head.{kind}.{idx}.gn.'
                          f'{"weight" if leaf == "scale" else "bias"}'] = \
                        torch.tensor(v)
                return
            block = path[1]
            mod = path[2]
            if 'dfmconv' in mod:
                # (k2, Cin, Cout) -> (Cout, Cin, k, k)
                k2, cin, cout = v.shape
                k = int(np.sqrt(k2))
                w = np.transpose(v, (2, 1, 0)).reshape(cout, cin, k, k)
                state[f'bbox_head.{block}.{mod}.weight'] = torch.tensor(w)
                return
            leaf = path[3]
            if mod in ('cls_out', 'keypts_out', 'reppts_out'):
                if leaf == 'kernel':
                    w = np.transpose(v, (1, 0))[:, :, None, None]
                    state[f'bbox_head.{block}.{mod}.weight'] = torch.tensor(w)
                else:
                    state[f'bbox_head.{block}.{mod}.bias'] = torch.tensor(v)
            else:  # cls_conv / keypts_conv 3x3
                if leaf == 'kernel':
                    state[f'bbox_head.{block}.{mod}.weight'] = _t_conv(v)
                else:
                    state[f'bbox_head.{block}.{mod}.bias'] = torch.tensor(v)

    def _t_conv(v):
        return torch.tensor(np.transpose(v, (3, 2, 0, 1)))

    def _t_dcn(v):
        # (k2, Cin, Cout) -> (Cout, Cin, k, k)
        k2, cin, cout = v.shape
        k = int(np.sqrt(k2))
        return torch.tensor(
            np.transpose(v, (2, 1, 0)).reshape(cout, cin, k, k))

    walk(variables['params'], [])
    for mod_path, leaves in _flatten_stats(variables['batch_stats']):
        name = mod_path.replace('/', '.').replace(
            'downsample_bn', 'downsample.1')
        for leaf, v in leaves.items():
            tleaf = {'mean': 'running_mean', 'var': 'running_var'}[leaf]
            state[f'backbone.{name}.{tleaf}'] = torch.tensor(np.asarray(v))
    return state


def _flatten_stats(tree, prefix=''):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict) and any(
                isinstance(x, dict) for x in v.values()):
            out.extend(_flatten_stats(v, f'{prefix}{k}/'))
        elif isinstance(v, dict):
            out.append((f'{prefix}{k}'.replace('backbone/', '', 1), v))
    return out


@pytest.fixture(scope='module')
def tiny_variables():
    from tests.common import TINY_CANVAS
    cfg = tiny_cfg()
    model = build_model(cfg)
    return init_variables(model, cfg, canvas_hw=TINY_CANVAS)


def test_roundtrip_conversion_exact(tiny_variables):
    variables = tiny_variables
    state = _flax_to_torch_state(variables)
    params, stats, skipped = convert_state_dict(state)
    assert not skipped, skipped
    merged = merge_into_variables(variables, params, stats, strict=True)

    flat_a = _leaves(variables['params'])
    flat_b = _leaves(merged['params'])
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), atol=1e-6,
            err_msg=k)
    flat_sa = _leaves(variables['batch_stats'])
    flat_sb = _leaves(merged['batch_stats'])
    assert flat_sa.keys() == flat_sb.keys()


def _leaves(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_leaves(v, f'{prefix}{k}/'))
        else:
            out[f'{prefix}{k}'] = v
    return out


def test_shape_mismatch_rejected(tiny_variables):
    variables = tiny_variables
    bad = {'backbone': {'conv1': {'kernel':
                                  np.zeros((3, 3, 3, 64), np.float32)}}}
    with pytest.raises(ValueError, match='shape'):
        merge_into_variables(variables, bad, {}, strict=True)


def test_flax_conv_matches_torch_conv():
    """Padding/stride/layout conventions agree with torch for the stem conv."""
    import jax.numpy as jnp
    from kgdet_tpu.models.resnet import _conv

    rng = np.random.RandomState(0)
    x = rng.randn(1, 9, 11, 4).astype(np.float32)
    w = rng.randn(6, 4, 3, 3).astype(np.float32)  # torch OIHW

    t = torch.nn.functional.conv2d(
        torch.tensor(np.transpose(x, (0, 3, 1, 2))), torch.tensor(w),
        stride=2, padding=1)
    want = np.transpose(t.numpy(), (0, 2, 3, 1))

    conv = _conv(6, 3, 2)
    kernel = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
    got = conv.apply({'params': {'kernel': jnp.asarray(kernel)}},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_frozen_bn_matches_torch_eval_bn():
    from kgdet_tpu.models.layers import FrozenBatchNorm
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 8).astype(np.float32)
    scale = rng.rand(8).astype(np.float32) + 0.5
    bias = rng.randn(8).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.5

    bn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(scale))
        bn.bias.copy_(torch.tensor(bias))
        bn.running_mean.copy_(torch.tensor(mean))
        bn.running_var.copy_(torch.tensor(var))
    want = np.transpose(
        bn(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).detach().numpy(),
        (0, 2, 3, 1))

    got = FrozenBatchNorm().apply(
        {'params': {'scale': jnp.asarray(scale), 'bias': jnp.asarray(bias)},
         'batch_stats': {'mean': jnp.asarray(mean),
                         'var': jnp.asarray(var)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_s2d_stem_exactness():
    """Space-to-depth stem == plain 7x7/2 conv with the same kernel."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from kgdet_tpu.models.resnet import s2d_stem_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)
    want = lax.conv_general_dilated(
        x, w, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    got = s2d_stem_conv(x, w)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_deconv_kernel_matches_torch_convtranspose():
    """flax ConvTranspose(2x2/2) with the converted kernel == torch deconv."""
    import flax.linen as nn
    import jax.numpy as jnp

    from kgdet_tpu.utils.torch_convert import _deconv_kernel

    rng = np.random.RandomState(2)
    x = rng.randn(1, 5, 6, 3).astype(np.float32)
    w = rng.randn(3, 4, 2, 2).astype(np.float32)     # (Cin, Cout, kh, kw)
    b = rng.randn(4).astype(np.float32)

    t = torch.nn.functional.conv_transpose2d(
        torch.tensor(np.transpose(x, (0, 3, 1, 2))), torch.tensor(w),
        torch.tensor(b), stride=2)
    want = np.transpose(t.numpy(), (0, 2, 3, 1))

    mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    got = mod.apply({'params': {'kernel': jnp.asarray(_deconv_kernel(w)),
                                'bias': jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_roi_flat_fc_kernel_permutation():
    """torch Linear over (C,r,r)-flat == flax Dense over (r,r,C)-flat."""
    import jax.numpy as jnp

    from kgdet_tpu.utils.torch_convert import _roi_flat_fc_kernel

    rng = np.random.RandomState(3)
    c, r, out = 5, 7, 8
    feat = rng.randn(2, r, r, c).astype(np.float32)   # flax layout
    w = rng.randn(out, c * r * r).astype(np.float32)  # torch fc weight

    torch_in = np.transpose(feat, (0, 3, 1, 2)).reshape(2, -1)
    want = torch_in @ w.T

    got = feat.reshape(2, -1) @ _roi_flat_fc_kernel(w, roi=r)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_upgrade_model_version_renames():
    from kgdet_tpu.tools.upgrade_model_version import upgrade_state_dict
    state = {
        'bbox_head.cls_convs.0.weight': np.zeros((1,)),
        'bbox_head.cls_convs.0.bias': np.zeros((1,)),
        'bbox_head.reg_convs.2.weight': np.zeros((1,)),
        'bbox_head.cls_convs.0.gn.weight': np.zeros((1,)),
        'backbone.conv1.weight': np.zeros((1,)),
    }
    out, n = upgrade_state_dict(state)
    assert n == 3
    assert 'bbox_head.cls_convs.0.conv.weight' in out
    assert 'bbox_head.reg_convs.2.conv.weight' in out
    assert 'backbone.conv1.weight' in out
    assert 'bbox_head.cls_convs.0.gn.weight' in out


# ---------------------------------------------------- per-family round trips
def _serial_cfg(parallel=False, plain=False):
    from kgdet_tpu.config import (AssignConfig, BackboneConfig, HeadConfig,
                                  KGDetConfig, NeckConfig, TestConfig)
    htype = ('RepPointsHead' if plain
             else 'ParallelKpHead' if parallel else 'SerialKpHead')
    return KGDetConfig(
        backbone=BackboneConfig(depth=18),
        neck=NeckConfig(in_channels=(64, 128, 256, 512), out_channels=64,
                        start_level=1, num_outs=3, add_extra_convs=True,
                        select_out=None),
        head=HeadConfig(type=htype, num_classes=13, in_channels=64,
                        feat_channels=64, point_feat_channels=64,
                        stacked_convs=1, num_keypts=8, num_reppts=9,
                        point_strides=(8, 16, 32), gn_groups=8),
        refine_assigner=AssignConfig(type='MaxIoUAssigner'),
        test=TestConfig(nms_pre=50, max_per_class=10, max_per_img=20))


def _family_cfg(family):
    import dataclasses

    from kgdet_tpu.config import BackboneConfig
    if family == 'serial':
        return _serial_cfg()
    if family == 'parallel':
        return _serial_cfg(parallel=True)
    if family == 'reppoints':
        return _serial_cfg(plain=True)
    if family == 'kgdet1rep':
        cfg = tiny_cfg()
        return cfg.replace(head=dataclasses.replace(
            cfg.head, type='KGDetHead1Rep', num_reppts=9))
    if family == 'retina':
        from tests.test_retina import retina_cfg
        return retina_cfg()
    if family == 'fcos':
        from tests.test_fcos import fcos_cfg
        return fcos_cfg()
    if family == 'ssd':
        from tests.test_ssd import ssd_cfg
        return ssd_cfg()
    if family == 'ga_retina':
        from tests.test_ga import ga_cfg
        return ga_cfg()
    if family == 'resnext':
        cfg = tiny_cfg()
        return cfg.replace(
            backbone=BackboneConfig(type='ResNeXt', depth=50, groups=4,
                                    base_width=4),
            neck=dataclasses.replace(
                cfg.neck, in_channels=(256, 512, 1024, 2048)))
    raise KeyError(family)


@pytest.mark.parametrize('family', [
    'serial', 'parallel', 'reppoints', 'kgdet1rep', 'retina', 'fcos',
    'ssd', 'ga_retina', 'resnext'])
def test_family_roundtrip_no_skips(family):
    """Every implemented head family converts with skipped == [] and the
    round trip (flax -> torch names -> flax) is the identity."""
    from tests.common import TINY_CANVAS
    cfg = _family_cfg(family)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=TINY_CANVAS)
    state = _flax_to_torch_state(variables)
    params, stats, skipped = convert_state_dict(state)
    assert not skipped, skipped
    merged = merge_into_variables(variables, params, stats, strict=True)
    flat_a = _leaves(variables['params'])
    flat_b = _leaves(merged['params'])
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), atol=1e-6,
            err_msg=k)
