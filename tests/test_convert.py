"""Checkpoint converter tests: name mapping, layout transposes, conv parity."""
import re

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
    grid_deconvs = {}          # assembled into grouped tensors at the end

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k])
            else:
                emit(path + [k], np.asarray(v))

    def _res_block_emit(tprefix, block, sub, leaf, v):
        """Backbone-style residual block params -> torch names."""
        b = block.replace('/', '.')
        if sub == 'downsample_conv':
            state[f'{tprefix}.{b}.downsample.0.weight'] = _t_conv(v)
        elif sub == 'downsample_bn':
            state[f'{tprefix}.{b}.downsample.1.'
                  f'{"weight" if leaf == "scale" else "bias"}'] = \
                torch.tensor(v)
        elif sub.startswith('conv'):
            state[f'{tprefix}.{b}.{sub}.weight'] = _t_conv(v)
        else:                                # bn scale/bias
            state[f'{tprefix}.{b}.{sub}.'
                  f'{"weight" if leaf == "scale" else "bias"}'] = \
                torch.tensor(v)

    def _convfc_emit(tprefix, mod, leaf, v):
        """ConvFC / Double-Head box-head params -> torch names. Returns
        False for modules it does not recognize."""
        m = re.match(r'(shared_fc|fc_branch)_(\d+)$', mod)
        if m:
            kind = 'shared_fcs' if m.group(1) == 'shared_fc' else 'fc_branch'
            if leaf == 'kernel':
                val = _t_roi_fc(v) if m.group(2) == '0' else _t_fc(v)
            else:
                val = torch.tensor(v)
            state[f'{tprefix}.{kind}.{m.group(2)}.'
                  f'{"weight" if leaf == "kernel" else "bias"}'] = val
            return True
        if mod in ('fc_cls', 'fc_reg'):
            state[f'{tprefix}.{mod}.'
                  f'{"weight" if leaf == "kernel" else "bias"}'] = \
                _t_fc(v) if leaf == 'kernel' else torch.tensor(v)
            return True
        return False

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
            # HRNet: transition/fuse chains are flat '<...>/conv' keys
            # (Sequential slots 0=conv, 1=bn); branch blocks are
            # 'stageX/M/branches/I/J' keys with resnet-style sub modules
            if path[1].startswith('transition') or \
                    'fuse_layers' in path[1]:
                leaf = path[2]
                base = path[1].replace('/conv', '/0').replace(
                    '/bn', '/1').replace('/', '.')
                if leaf == 'kernel':
                    state[f'backbone.{base}.weight'] = _t_conv(v)
                else:
                    state[f'backbone.{base}.'
                          f'{"weight" if leaf == "scale" else "bias"}'] = \
                        torch.tensor(v)
                return
            if path[1].startswith('stage'):
                _res_block_emit('backbone', path[1], path[2], path[3], v)
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
        elif comp == 'shared_head':
            _res_block_emit('shared_head', path[1], path[2], path[3], v)
        elif comp == 'rpn_head':
            mod = path[1]
            if mod == 'feature_adaption':
                if path[2] == 'conv_adaption':
                    state['rpn_head.feature_adaption.conv_adaption'
                          '.weight'] = _t_dcn(v)
                else:
                    state['rpn_head.feature_adaption.conv_offset'
                          '.weight'] = _t_conv(v)
                return
            leaf = path[2]
            state[f'rpn_head.{mod}.'
                  f'{"weight" if leaf == "kernel" else "bias"}'] = \
                _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
        elif comp == 'bbox_head' or re.match(r'bbox_head_\d+$', comp):
            tprefix = 'bbox_head' if comp == 'bbox_head' \
                else f'bbox_head.{comp.rsplit("_", 1)[1]}'
            mod = path[1]
            if _convfc_emit(tprefix, mod, path[-1], v):
                return
            if mod == 'res_block':
                sub, leaf = path[2], path[3]
                if sub.startswith('conv'):
                    state[f'{tprefix}.res_block.{sub}.conv.'
                          f'{"weight" if leaf == "kernel" else "bias"}'] = \
                        _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                else:                        # gn1/gn2/gn_identity
                    state[f'{tprefix}.res_block.'
                          f'{sub.replace("gn", "conv")}.gn.'
                          f'{"weight" if leaf == "scale" else "bias"}'] = \
                        torch.tensor(v)
                return
            m = re.match(r'conv_branch_(\d+)$', mod)
            if m:
                sub, leaf = path[2], path[3]
                if sub.startswith('conv'):
                    state[f'{tprefix}.conv_branch.{m.group(1)}.{sub}'
                          f'.weight'] = _t_conv(v)
                else:
                    state[f'{tprefix}.conv_branch.{m.group(1)}.{sub}.'
                          f'{"weight" if leaf == "scale" else "bias"}'] = \
                        torch.tensor(v)
                return
            raise KeyError(f'{comp}/{mod}')
        elif comp == 'mask_head' or re.match(r'mask_head_\d+$', comp):
            tprefix = 'mask_head' if comp == 'mask_head' \
                else f'mask_head.{comp.rsplit("_", 1)[1]}'
            mod, leaf = path[1], path[2]
            tleaf = 'weight' if leaf == 'kernel' else 'bias'
            m = re.match(r'conv_(\d+)$', mod)
            if m:
                state[f'{tprefix}.convs.{m.group(1)}.conv.{tleaf}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
            elif mod == 'conv_res':
                state[f'{tprefix}.conv_res.conv.{tleaf}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
            elif mod == 'upsample':
                state[f'{tprefix}.upsample.{tleaf}'] = \
                    _t_deconv(v) if leaf == 'kernel' else torch.tensor(v)
            elif mod == 'conv_logits':
                # re-add the background channel 0 the converter drops
                if leaf == 'kernel':
                    w = np.asarray(_t_conv(v))
                    state[f'{tprefix}.conv_logits.weight'] = torch.tensor(
                        np.concatenate([np.zeros_like(w[:1]), w]))
                else:
                    state[f'{tprefix}.conv_logits.bias'] = torch.tensor(
                        np.concatenate([np.zeros_like(v[:1]), v]))
            else:
                raise KeyError(f'{comp}/{mod}')
        elif comp == 'mask_iou_head':
            mod, leaf = path[1], path[2]
            tleaf = 'weight' if leaf == 'kernel' else 'bias'
            m = re.match(r'conv_(\d+)$', mod)
            if m:                            # plain nn.Conv2d list
                state[f'mask_iou_head.convs.{m.group(1)}.{tleaf}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                return
            m = re.match(r'fc_(\d+)$', mod)
            if m:
                if leaf == 'kernel':
                    val = _t_roi_fc(v) if m.group(1) == '0' else _t_fc(v)
                else:
                    val = torch.tensor(v)
                state[f'mask_iou_head.fcs.{m.group(1)}.{tleaf}'] = val
                return
            assert mod == 'fc_mask_iou', mod
            state[f'mask_iou_head.fc_mask_iou.{tleaf}'] = \
                _t_fc(v) if leaf == 'kernel' else torch.tensor(v)
        elif comp == 'semantic_head':
            mod, leaf = path[1], path[2]
            tleaf = 'weight' if leaf == 'kernel' else 'bias'
            m = re.match(r'(lateral_convs|convs)_(\d+)$', mod)
            if m:
                state[f'semantic_head.{m.group(1)}.{m.group(2)}.conv.'
                      f'{tleaf}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
            elif mod == 'conv_embedding':
                state[f'semantic_head.conv_embedding.conv.{tleaf}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
            else:                            # conv_logits: plain nn.Conv2d
                state[f'semantic_head.conv_logits.{tleaf}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
        elif comp == 'grid_head':
            mod = path[1]
            leaf = path[-1]
            tleaf = 'weight' if leaf in ('kernel',) else \
                ('weight' if leaf == 'scale' else 'bias')
            m = re.match(r'convs_(\d+)$', mod)
            if m:
                state[f'grid_head.convs.{m.group(1)}.conv.'
                      f'{"weight" if leaf == "kernel" else "bias"}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                return
            m = re.match(r'convs_gn_(\d+)$', mod)
            if m:
                state[f'grid_head.convs.{m.group(1)}.gn.{tleaf}'] = \
                    torch.tensor(v)
                return
            m = re.match(r'([fs])order_(\d+)_(\d+)$', mod)
            if m:
                seq = '0' if path[2] == 'dw' else '1'
                state[f'grid_head.{m.group(1)}order_trans.{m.group(2)}.'
                      f'{m.group(3)}.{seq}.'
                      f'{"weight" if leaf == "kernel" else "bias"}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                return
            if mod == 'deconv1_gn':
                state[f'grid_head.norm1.{tleaf}'] = torch.tensor(v)
                return
            m = re.match(r'(deconv[12])_(\d+)$', mod)
            if m:                             # grouped: assemble later
                grid_deconvs.setdefault(
                    (m.group(1), leaf), {})[int(m.group(2))] = v
                return
            raise KeyError(f'{comp}/{mod}')
        elif comp == 'neck':
            # list-form Libra neck: flax 'fpn'/'bfp' submodules <-> the
            # reference's neck.0 (FPN) / neck.1 (BFP)
            tprefix, rest = 'neck', path[1:]
            if rest[0] in ('fpn', 'bfp'):
                tprefix = f'neck.{0 if rest[0] == "fpn" else 1}'
                rest = rest[1:]
            if rest[0] == 'refine':           # BFP non-local refine
                sub, leaf = rest[1], rest[2]
                state[f'{tprefix}.refine.{sub}.conv.'
                      f'{"weight" if leaf == "kernel" else "bias"}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                return
            if rest[0] == 'reduction_conv' or \
                    re.match(r'fpn_convs_\d+$', rest[0]):
                # HRFPN ConvModules (hrfpn.py:47-57)
                name = rest[0].replace('fpn_convs_', 'fpn_convs.')
                leaf = rest[1]
                state[f'{tprefix}.{name}.conv.'
                      f'{"weight" if leaf == "kernel" else "bias"}'] = \
                    _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                return
            kind, idx = rest[0].rsplit('_', 1)
            mod = rest[1]
            leaf = rest[2]
            if mod == 'conv':
                val = _t_conv(v) if leaf == 'kernel' else torch.tensor(v)
                state[f'{tprefix}.{kind}_convs.{idx}.conv.'
                      f'{"weight" if leaf == "kernel" else "bias"}'] = val
            else:
                state[f'{tprefix}.{kind}_convs.{idx}.gn.'
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

    def _t_fc(v):
        return torch.tensor(np.transpose(v, (1, 0)))

    def _t_roi_fc(v, roi=7):
        # inverse of torch_convert._roi_flat_fc_kernel
        in_f, out_f = v.shape
        c = in_f // (roi * roi)
        return torch.tensor(np.transpose(
            v.reshape(roi, roi, c, out_f), (3, 2, 0, 1)).reshape(
                out_f, in_f))

    def _t_deconv(v):
        # inverse of torch_convert._deconv_kernel:
        # flax (kh, kw, Cin, Cout) -> torch (Cin, Cout, kh, kw)
        return torch.tensor(
            np.transpose(v[::-1, ::-1], (2, 3, 0, 1)).copy())

    walk(variables['params'], [])
    # grid head grouped deconvs: per-point flax modules -> one grouped
    # ConvTranspose2d tensor (grid_head.py deconv1/deconv2)
    for (name, leaf), slices in grid_deconvs.items():
        vals = [slices[i] for i in sorted(slices)]
        if leaf == 'kernel':
            state[f'grid_head.{name}.weight'] = torch.tensor(
                np.concatenate([np.asarray(_t_deconv(v)) for v in vals]))
        else:
            state[f'grid_head.{name}.bias'] = torch.tensor(
                np.concatenate(vals))
    for comp, tree in variables.get('batch_stats', {}).items():
        for mod_path, leaves in _flatten_stats(tree):
            if mod_path.startswith('transition') or \
                    'fuse_layers' in mod_path:
                # HRNet Sequential chains: slot 0 = conv, slot 1 = bn
                name = mod_path.replace('/conv', '/0').replace(
                    '/bn', '/1').replace('/', '.')
            else:
                name = mod_path.replace('/', '.').replace(
                    'downsample_bn', 'downsample.1')
            for leaf, v in leaves.items():
                tleaf = {'mean': 'running_mean', 'var': 'running_var'}[leaf]
                state[f'{comp}.{name}.{tleaf}'] = torch.tensor(np.asarray(v))
    return state


def _flatten_stats(tree, prefix=''):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict) and any(
                isinstance(x, dict) for x in v.values()):
            out.extend(_flatten_stats(v, f'{prefix}{k}/'))
        elif isinstance(v, dict):
            out.append((f'{prefix}{k}', v))
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
    # ------------------------------------------------- two-stage families
    from kgdet_tpu.config import DataConfig
    from tests.test_two_stage import frcnn_cfg
    mask_data = DataConfig(with_mask=True, mask_stride=4, max_gts=4)
    if family == 'faster':
        return frcnn_cfg()
    if family == 'fast':
        return frcnn_cfg().replace(detector_type='fast_rcnn')
    if family == 'cascade':
        return frcnn_cfg().replace(detector_type='cascade_rcnn')
    if family == 'mask':
        return frcnn_cfg().replace(detector_type='mask_rcnn',
                                   train_data=mask_data)
    if family == 'msrcnn':
        return frcnn_cfg().replace(detector_type='ms_rcnn',
                                   train_data=mask_data)
    if family == 'htc_semantic':
        base = frcnn_cfg()
        return base.replace(
            detector_type='htc', with_semantic=True,
            head=dataclasses.replace(base.head, num_stuff_classes=8),
            train_data=dataclasses.replace(mask_data, seg_stride=16))
    if family == 'grid':
        return frcnn_cfg().replace(detector_type='grid_rcnn')
    if family == 'double':
        return frcnn_cfg().replace(detector_type='double_head_rcnn')
    if family == 'c4':
        return frcnn_cfg().replace(rcnn_head='res_layer')
    if family == 'rpn':
        return frcnn_cfg().replace(detector_type='rpn')
    if family == 'ga_rpn':
        return frcnn_cfg().replace(rpn_type='ga_rpn')
    if family == 'libra':
        base = frcnn_cfg()
        return base.replace(neck=dataclasses.replace(
            base.neck, type='FPNBFP', start_level=0,
            bfp_refine_level=1, bfp_refine_type='non_local'))
    if family == 'ssdvgg':
        from tests.test_backbones_necks import ssdvgg_cfg
        return ssdvgg_cfg()
    if family == 'hrnet':
        from tests.test_backbones_necks import hrnet_cfg
        return hrnet_cfg()
    raise KeyError(family)


# every converter-covered family; test_config_sweep_converter_coverage
# maps each shipped config onto one of these so a new config cannot ship
# without a no-skips round trip
FAMILIES = [
    'serial', 'parallel', 'reppoints', 'kgdet1rep', 'retina', 'fcos',
    'ssd', 'ga_retina', 'resnext', 'faster', 'fast', 'cascade', 'mask',
    'msrcnn', 'htc_semantic', 'grid', 'double', 'c4', 'rpn', 'ga_rpn',
    'libra', 'ssdvgg', 'hrnet']


def test_config_sweep_converter_coverage():
    """Every shipped config maps onto a converter round-trip family: a new
    config cannot land without naming (and thus exercising) its converter
    coverage here."""
    import glob
    import os
    CONFIG_FAMILY = {
        'cascade_rcnn_r50_fpn_1x_deepfashion2.py': 'cascade',
        'fast_rcnn_r50_fpn_1x_deepfashion2.py': 'fast',
        # HRNet trunk + HRFPN neck exercised by 'hrnet'; the faster-rcnn
        # head namespaces by 'faster'
        'faster_rcnn_hrnetv2p_w32_1x_deepfashion2.py': 'hrnet',
        'faster_rcnn_r50_caffe_c4_1x_deepfashion2.py': 'c4',
        'faster_rcnn_r50_fpn_1x_deepfashion2.py': 'faster',
        'faster_rcnn_x101_32x4d_fpn_1x_deepfashion2.py': 'resnext',
        'htc_r50_fpn_1x_deepfashion2.py': 'htc_semantic',
        'kgdet_moment_r50_fpn_1x_deepfashion2.py': 'kgdet',
        'kgdet_moment_r50_fpn_1x_demo.py': 'kgdet',
        'kgdet_moment_r50_fpn_1x_demo_overfit.py': 'kgdet',
        'libra_faster_rcnn_r50_fpn_1x_deepfashion2.py': 'libra',
        'mask_rcnn_r50_fpn_1x_deepfashion2.py': 'mask',
        'ms_rcnn_r50_fpn_1x_deepfashion2.py': 'msrcnn',
        'reppoints_moment_parallel_r50_fpn_1x_deepfashion2.py': 'parallel',
        'reppoints_moment_serial_r50_fpn_1x_deepfashion2.py': 'serial',
        'rpn_r50_fpn_1x_deepfashion2.py': 'rpn',
        'ssd300_vgg16_deepfashion2.py': 'ssdvgg',
    }
    # 'kgdet' (the Kp3Rep cascade) round-trips in
    # test_roundtrip_conversion_exact on the module-scoped tiny cfg
    covered = set(FAMILIES) | {'kgdet'}
    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'configs')
    for path in sorted(glob.glob(os.path.join(cfg_dir, '*.py'))):
        name = os.path.basename(path)
        assert name in CONFIG_FAMILY, \
            f'config {name} has no converter round-trip family'
        assert CONFIG_FAMILY[name] in covered, (name, CONFIG_FAMILY[name])


@pytest.mark.parametrize('family', FAMILIES)
def test_family_roundtrip_no_skips(family):
    """Every implemented head family converts with skipped == [] and the
    round trip (flax -> torch names -> flax) is the identity."""
    from tests.common import TINY_CANVAS
    cfg = _family_cfg(family)
    model = build_model(cfg)
    if family == 'fast':
        # Fast R-CNN has no RPN: init needs external proposals
        import jax
        import jax.numpy as jnp
        x = jnp.zeros((1, TINY_CANVAS[0], TINY_CANVAS[1], 3))
        props = jnp.tile(jnp.asarray([[4., 4., 20., 20.]]), (1, 8, 1))
        variables = dict(jax.jit(lambda r: model.init(
            r, x, train=True, proposals=props,
            proposals_valid=jnp.ones((1, 8), bool)))(jax.random.PRNGKey(0)))
    else:
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
