"""Lossless PyTorch .pth -> kgdet_tpu pytree checkpoint converter.

The reference ships KGDet weights as mmcv .pth files (model state_dict with
keys like ``backbone.layer1.0.conv1.weight``). This module maps every tensor
by name into the flax layout used here (NHWC convs, Dense 1x1s, FrozenBN with
stats in batch_stats), so converted checkpoints reproduce the reference
network exactly.

Layout conventions:
  torch Conv2d weight (Cout, Cin, kh, kw) -> flax Conv kernel (kh, kw, Cin, Cout)
  torch 1x1 Conv2d    (Cout, Cin, 1, 1)   -> flax Dense kernel (Cin, Cout)
  DeformConv weight   (Cout, Cin, k, k)   -> tap-major (k*k, Cin, Cout)
  BatchNorm weight/bias -> params scale/bias; running stats -> batch_stats
  GroupNorm weight/bias -> params scale/bias

Parity reference for source names: mmdetection/mmdet/models/backbones/
resnet.py, necks/fpn2.py, anchor_heads/reppoints_head_kp3rep_cas_1_assign_once.py
(attributes cls_convs/reg_convs/kp_rep_block_{1,2,3}/moment_transfer).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    assert w.shape[2] == w.shape[3] == 1, w.shape
    return np.transpose(w[:, :, 0, 0], (1, 0))


def _dcn_kernel(w: np.ndarray) -> np.ndarray:
    cout, cin, kh, kw = w.shape
    return np.transpose(w.reshape(cout, cin, kh * kw), (2, 1, 0))


def _fc_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _roi_flat_fc_kernel(w: np.ndarray, roi: int = 7) -> np.ndarray:
    """FC over flattened RoI features: torch flattens (C, r, r), flax
    flattens (r, r, C) — permute the input rows accordingly."""
    out_f, in_f = w.shape
    c = in_f // (roi * roi)
    assert c * roi * roi == in_f, (w.shape, roi)
    return np.transpose(w.reshape(out_f, c, roi, roi),
                        (2, 3, 1, 0)).reshape(in_f, out_f)


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (Cin, Cout, kh, kw) -> flax (kh, kw, Cin, Cout).

    flax ConvTranspose applies the kernel unflipped (lax.conv_transpose)
    while torch's deconv is the gradient of a conv (implicit spatial flip),
    so the spatial axes are reversed here.
    """
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def convert_state_dict(state_dict: Dict[str, Any]):
    """Map a KGDet torch state_dict to (params, batch_stats) pytrees.

    ``state_dict`` values may be torch tensors or numpy arrays.
    Returns (params, batch_stats, skipped_keys).
    """
    params: Dict = {}
    stats: Dict = {}
    skipped = []

    def npy(v):
        if hasattr(v, 'detach'):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    # blocks whose conv2 is a DeformConv (reference resnet.py:171-186 pairs
    # every DCN conv2 with a conv2_offset conv) — their conv2.weight needs
    # the tap-major DCN layout instead of the HWIO conv layout
    dcn_blocks = set()
    for key in state_dict:
        m = re.match(r'backbone\.(layer\d)\.(\d+)\.conv2_offset\.', key)
        if m:
            dcn_blocks.add(f'{m.group(1)}/{m.group(2)}')
    # HRFPN and plain FPN both register 'fpn_convs.N' torch modules
    # (necks/hrfpn.py:54-57 vs fpn2.py); only HRFPN has a reduction_conv,
    # so its presence selects the HRFPN flax naming for fpn_convs keys
    neck_is_hrfpn = any(k.startswith('neck.reduction_conv.')
                        for k in state_dict)

    for key, val in state_dict.items():
        v = npy(val)
        parts = key.split('.')
        if parts[0] == 'backbone':
            _convert_backbone(parts[1:], v, params, stats, skipped, key,
                              dcn_blocks)
        elif parts[0] == 'neck':
            _convert_neck(parts[1:], v, params, skipped, key,
                          is_hrfpn=neck_is_hrfpn)
        elif parts[0] == 'bbox_head':
            _convert_head(parts[1:], v, params, skipped, key)
        elif parts[0] == 'rpn_head':
            _convert_rpn(parts[1:], v, params, skipped, key)
        elif parts[0] == 'mask_head':
            # HTC registers per-stage mask heads as a ModuleList
            # (htc.py mask_head.<stage>.<...>); plain Mask R-CNN has one
            if parts[1].isdigit():
                _convert_mask_head(parts[2:], v, params, skipped, key,
                                   target=f'mask_head_{parts[1]}')
            else:
                _convert_mask_head(parts[1:], v, params, skipped, key)
        elif parts[0] == 'grid_head':
            _convert_grid_head(parts[1:], v, params, skipped, key)
        elif parts[0] == 'shared_head':
            _convert_shared_head(parts[1:], v, params, stats, skipped, key)
        elif parts[0] == 'mask_iou_head':
            _convert_maskiou_head(parts[1:], v, params, skipped, key)
        elif parts[0] == 'semantic_head':
            _convert_semantic_head(parts[1:], v, params, skipped, key)
        else:
            skipped.append(key)
    head = params.get('head')
    if head and '_scales_tmp' in head:
        tmp = head.pop('_scales_tmp')
        head['scales'] = np.asarray(
            [float(tmp[k]) for k in sorted(tmp, key=int)], np.float32)
    return params, stats, skipped


def _bn(parts, v, params, stats, prefix):
    leaf = parts[-1]
    if leaf == 'weight':
        _set(params, prefix + ('scale',), v)
    elif leaf == 'bias':
        _set(params, prefix + ('bias',), v)
    elif leaf == 'running_mean':
        _set(stats, prefix + ('mean',), v)
    elif leaf == 'running_var':
        _set(stats, prefix + ('var',), v)
    elif leaf == 'num_batches_tracked':
        pass
    else:
        raise KeyError(leaf)


def _convert_backbone(parts, v, params, stats, skipped, key, dcn_blocks=()):
    # SSDVGG trunk (ssd_vgg.py): features.N / extra.N convs + l2_norm scale
    if parts[0] in ('features', 'extra'):
        leaf = 'kernel' if parts[2] == 'weight' else 'bias'
        _set(params, ('backbone', f'{parts[0]}_{parts[1]}', leaf),
             _conv_kernel(v) if leaf == 'kernel' else v)
        return
    if parts[0] == 'l2_norm':
        _set(params, ('backbone', 'l2_norm', 'scale'), v)
        return
    # HRNet (backbones/hrnet.py): transition chains + multi-branch stages.
    # flax names with '/' are literal keys, so the conv/bn modules live at
    # flat keys like 'transition1/0/0/conv'.
    if re.match(r'transition\d$', parts[0]):
        # 4-part = channel-fix Sequential(conv, bn, relu) at chain slot 0;
        # 5-part = new-branch chain of Sequential(conv, bn, relu)
        if len(parts) == 4:
            base = f'{parts[0]}/{parts[1]}/0'
            seq = parts[2]
        else:
            base = f'{parts[0]}/{parts[1]}/{parts[2]}'
            seq = parts[3]
        if seq == '0':
            _set(params, ('backbone', f'{base}/conv', 'kernel'),
                 _conv_kernel(v))
        else:
            _bn(parts, v, params, stats, ('backbone', f'{base}/bn'))
        return
    if re.match(r'stage\d$', parts[0]):
        m = parts[1]
        if parts[2] == 'branches':
            block = f'{parts[0]}/{m}/branches/{parts[3]}/{parts[4]}'
            sub = parts[5]
            prefix = ('backbone', block)
            if sub.startswith('conv'):
                _set(params, prefix + (sub, 'kernel'), _conv_kernel(v))
            elif sub.startswith('bn'):
                _bn(parts, v, params, stats, prefix + (sub,))
            elif sub == 'downsample':
                if parts[6] == '0':
                    _set(params, prefix + ('downsample_conv', 'kernel'),
                         _conv_kernel(v))
                else:
                    _bn(parts, v, params, stats,
                        prefix + ('downsample_bn',))
            else:
                skipped.append(key)
            return
        if parts[2] == 'fuse_layers':
            i, j = parts[3], parts[4]
            base = f'{parts[0]}/{m}/fuse_layers/{i}/{j}'
            if len(parts) == 7:          # j > i: Sequential(conv, bn, up)
                seq = parts[5]
            else:                        # j < i: chain .k.(0|1)
                base = f'{base}/{parts[5]}'
                seq = parts[6]
            if seq == '0':
                _set(params, ('backbone', f'{base}/conv', 'kernel'),
                     _conv_kernel(v))
            else:
                _bn(parts, v, params, stats, ('backbone', f'{base}/bn'))
            return
        skipped.append(key)
        return
    if parts[0] in ('conv1', 'conv2'):
        _set(params, ('backbone', parts[0], 'kernel'), _conv_kernel(v))
    elif parts[0] in ('bn1', 'bn2'):
        _bn(parts, v, params, stats, ('backbone', parts[0]))
    elif re.match(r'layer\d$', parts[0]):
        block = f'{parts[0]}/{parts[1]}'
        sub = parts[2]
        if sub == 'conv2_offset':
            leaf = 'kernel' if parts[3] == 'weight' else 'bias'
            _set(params, ('backbone', block, 'conv2', 'conv_offset', leaf),
                 _conv_kernel(v) if leaf == 'kernel' else v)
        elif sub == 'gen_attention_block':
            _convert_gen_attention(
                parts[3:], v, params,
                ('backbone', block, 'gen_attention_block'), skipped, key)
        elif sub == 'context_block':
            _convert_context_block(
                parts[3:], v, params, ('backbone', block, 'context_block'),
                skipped, key)
        elif sub == 'conv2' and block in dcn_blocks:
            _set(params, ('backbone', block, 'conv2', 'weight'),
                 _dcn_kernel(v))
        elif sub.startswith('conv'):
            _set(params, ('backbone', block, sub, 'kernel'), _conv_kernel(v))
        elif sub.startswith('bn'):
            _bn(parts, v, params, stats, ('backbone', block, sub))
        elif sub == 'downsample':
            if parts[3] == '0':
                _set(params, ('backbone', block, 'downsample_conv', 'kernel'),
                     _conv_kernel(v))
            else:
                _bn(parts, v, params, stats,
                    ('backbone', block, 'downsample_bn'))
        else:
            skipped.append(key)
    else:
        skipped.append(key)


def _convert_neck(parts, v, params, skipped, key, is_hrfpn=False,
                  target=('neck',)):
    # list-form neck (e.g. Libra's [FPN, BFP], libra configs): neck.0 is
    # the FPN (flax submodule 'fpn'), neck.1 the BFP (flax 'bfp')
    if parts[0] in ('0', '1'):
        sub = 'fpn' if parts[0] == '0' else 'bfp'
        _convert_neck(parts[1:], v, params, skipped, key,
                      is_hrfpn=is_hrfpn, target=target + (sub,))
        return
    leaf = parts[-1]
    # HRFPN (necks/hrfpn.py:47-57): reduction_conv + per-level fpn_convs,
    # both ConvModules; flax names reduction_conv / fpn_convs_<i>
    if parts[0] == 'reduction_conv':
        _set(params, target + ('reduction_conv',
                               'kernel' if leaf == 'weight' else 'bias'),
             _conv_kernel(v) if leaf == 'weight' else v)
        return
    if is_hrfpn and parts[0] == 'fpn_convs':
        _set(params, target + (f'fpn_convs_{parts[1]}',
                               'kernel' if leaf == 'weight' else 'bias'),
             _conv_kernel(v) if leaf == 'weight' else v)
        return
    # BFP refine (necks/bfp.py:50-60): 'conv' form is one ConvModule;
    # 'non_local' form is a NonLocal2D with g/theta/phi/conv_out 1x1s
    if parts[0] == 'refine':
        if parts[1] in ('g', 'theta', 'phi', 'conv_out'):
            _set(params, target + ('refine', parts[1],
                                   'kernel' if leaf == 'weight' else 'bias'),
                 _conv_kernel(v) if leaf == 'weight' else v)
        else:                 # ConvModule: refine.conv.weight/bias
            _set(params, target + ('refine',
                                   'kernel' if leaf == 'weight' else 'bias'),
                 _conv_kernel(v) if leaf == 'weight' else v)
        return
    m = re.match(r'(lateral|fpn)_convs$', parts[0])
    if not m:
        skipped.append(key)
        return
    idx = parts[1]
    mod = parts[2]           # conv | gn
    leaf = parts[3]
    name = f'{m.group(1)}_{idx}'
    if mod == 'conv':
        if leaf == 'weight':
            _set(params, target + (name, 'conv', 'kernel'), _conv_kernel(v))
        else:
            _set(params, target + (name, 'conv', 'bias'), v)
    elif mod == 'gn':
        _set(params, target + (name, 'gn', 'scale' if leaf == 'weight'
                               else 'bias'), v)
    else:
        skipped.append(key)


def _convert_gen_attention(parts, v, params, prefix, skipped, key):
    """GeneralizedAttention: 1x1 convs -> Dense kernels, Linears, scalars."""
    mod = parts[0]
    if mod in ('query_conv', 'key_conv', 'value_conv', 'proj_conv'):
        if parts[1] == 'weight':
            _set(params, prefix + (mod, 'kernel'), _dense_kernel(v))
        else:
            _set(params, prefix + (mod, 'bias'), v)
    elif mod in ('appr_geom_fc_x', 'appr_geom_fc_y'):
        _set(params, prefix + (mod, 'kernel'), _fc_kernel(v))
    elif mod in ('appr_bias', 'geom_bias', 'gamma'):
        _set(params, prefix + (mod,), v)
    else:
        skipped.append(key)


def _convert_context_block(parts, v, params, prefix, skipped, key):
    """GCNet ContextBlock: conv_mask + Sequential(conv, LN, relu, conv)."""
    mod = parts[0]
    leaf = parts[-1]
    if mod == 'conv_mask':
        _set(params, prefix + ('conv_mask',
                               'kernel' if leaf == 'weight' else 'bias'),
             _conv_kernel(v) if leaf == 'weight' else v)
    elif mod in ('channel_add_conv', 'channel_mul_conv'):
        fusion = mod[:-5]                       # channel_add / channel_mul
        seq_idx = parts[1]
        if seq_idx == '0':
            _set(params, prefix + (f'{fusion}_conv1',
                                   'kernel' if leaf == 'weight' else 'bias'),
                 _conv_kernel(v) if leaf == 'weight' else v)
        elif seq_idx == '1':                    # LayerNorm
            _set(params, prefix + (f'{fusion}_ln',
                                   'scale' if leaf == 'weight' else 'bias'),
                 v.reshape(-1))
        elif seq_idx == '3':
            _set(params, prefix + (f'{fusion}_conv2',
                                   'kernel' if leaf == 'weight' else 'bias'),
                 _conv_kernel(v) if leaf == 'weight' else v)
        else:
            skipped.append(key)
    else:
        skipped.append(key)


def _ga_leaf(parts, v, params, target):
    """Guided-anchoring submodules shared by GA-RPN and GA-Retina heads."""
    mod = parts[0]
    if mod in ('conv_loc', 'conv_shape', 'conv_cls', 'conv_reg',
               'retina_cls', 'retina_reg'):
        leaf = 'kernel' if parts[1] == 'weight' else 'bias'
        _set(params, target + (mod, leaf),
             _conv_kernel(v) if leaf == 'kernel' else v)
        return True
    if mod in ('feature_adaption', 'feature_adaption_cls',
               'feature_adaption_reg'):
        sub = parts[1]
        if sub == 'conv_offset' and parts[2] == 'weight':
            _set(params, target + (mod, 'conv_offset', 'kernel'),
                 _conv_kernel(v))
        elif sub == 'conv_adaption' and parts[2] == 'weight':
            _set(params, target + (mod, 'conv_adaption'), _dcn_kernel(v))
        else:
            return False
        return True
    return False


def _convert_rpn(parts, v, params, skipped, key):
    """RPN heads: plain (rpn_head.py:19-23) and guided-anchoring
    (ga_rpn_head.py) module names."""
    if parts[0] in ('rpn_conv', 'rpn_cls', 'rpn_reg'):
        leaf = 'kernel' if parts[1] == 'weight' else 'bias'
        _set(params, ('rpn_head', parts[0], leaf),
             _conv_kernel(v) if leaf == 'kernel' else v)
    elif _ga_leaf(parts, v, params, ('rpn_head',)):
        pass
    else:
        skipped.append(key)


def _convert_mask_head(parts, v, params, skipped, key, target='mask_head'):
    """FCN mask head (fcn_mask_head.py): convs.N.conv + upsample + logits.
    HTC's per-stage variant (htc_mask_head.py:11-24) adds a conv_res
    ConvModule carrying the previous stage's mask features.

    The reference conv_logits carries a background channel 0
    (num_classes includes background in mmdet v1); the flax head predicts
    foreground classes only, so that channel is dropped here.
    """
    if parts[0] == 'convs':
        name = f'conv_{parts[1]}'
        leaf = 'kernel' if parts[3] == 'weight' else 'bias'
        _set(params, (target, name, leaf),
             _conv_kernel(v) if leaf == 'kernel' else v)
    elif parts[0] == 'conv_res':
        leaf = 'kernel' if parts[-1] == 'weight' else 'bias'
        _set(params, (target, 'conv_res', leaf),
             _conv_kernel(v) if leaf == 'kernel' else v)
    elif parts[0] == 'upsample':
        leaf = 'kernel' if parts[1] == 'weight' else 'bias'
        _set(params, (target, 'upsample', leaf),
             _deconv_kernel(v) if leaf == 'kernel' else v)
    elif parts[0] == 'conv_logits':
        if parts[1] == 'weight':
            _set(params, (target, 'conv_logits', 'kernel'),
                 _conv_kernel(v[1:]))
        else:
            _set(params, (target, 'conv_logits', 'bias'), v[1:])
    else:
        skipped.append(key)


def _convfc_leaf(parts, v, params, target):
    """Map one ConvFC box-head tensor onto module ``target``."""
    if parts[0] == 'shared_fcs':
        name = f'shared_fc_{parts[1]}'
        if parts[2] == 'weight':
            k = _roi_flat_fc_kernel(v) if parts[1] == '0' else _fc_kernel(v)
            _set(params, (target, name, 'kernel'), k)
        else:
            _set(params, (target, name, 'bias'), v)
        return True
    if parts[0] in ('fc_cls', 'fc_reg'):
        if parts[1] == 'weight':
            _set(params, (target, parts[0], 'kernel'), _fc_kernel(v))
        else:
            _set(params, (target, parts[0], 'bias'), v)
        return True
    return False


def _convert_grid_head(parts, v, params, skipped, key):
    """Grid R-CNN head (grid_head.py): conv trunk, fusion transitions,
    grouped deconvs sliced onto the per-point flax modules."""
    c = 64                                    # point_feat_channels
    mod = parts[0]
    if mod == 'convs':
        idx, sub, leaf = parts[1], parts[2], parts[3]
        if sub == 'conv':
            _set(params, ('grid_head', f'convs_{idx}',
                          'kernel' if leaf == 'weight' else 'bias'),
                 _conv_kernel(v) if leaf == 'weight' else v)
        else:                                 # gn
            _set(params, ('grid_head', f'convs_gn_{idx}',
                          'scale' if leaf == 'weight' else 'bias'), v)
    elif mod in ('forder_trans', 'sorder_trans'):
        i, j, seq, leaf = parts[1], parts[2], parts[3], parts[4]
        name = f'{mod[:6]}_{i}_{j}'           # forder_i_j / sorder_i_j
        sub = 'dw' if seq == '0' else 'pw'
        _set(params, ('grid_head', name, sub,
                      'kernel' if leaf == 'weight' else 'bias'),
             _conv_kernel(v) if leaf == 'weight' else v)
    elif mod == 'deconv1':
        if parts[1] == 'weight':              # (P*c, c, 4, 4) grouped
            for i in range(v.shape[0] // c):
                _set(params, ('grid_head', f'deconv1_{i}', 'kernel'),
                     _deconv_kernel(v[i * c:(i + 1) * c]))
        else:
            for i in range(v.shape[0] // c):
                _set(params, ('grid_head', f'deconv1_{i}', 'bias'),
                     v[i * c:(i + 1) * c])
    elif mod == 'norm1':
        _set(params, ('grid_head', 'deconv1_gn',
                      'scale' if parts[1] == 'weight' else 'bias'), v)
    elif mod == 'deconv2':
        if parts[1] == 'weight':              # (P*c, 1, 4, 4) grouped
            for i in range(v.shape[0] // c):
                _set(params, ('grid_head', f'deconv2_{i}', 'kernel'),
                     _deconv_kernel(v[i * c:(i + 1) * c]))
        else:                                 # bias (P,)
            for i in range(v.shape[0]):
                _set(params, ('grid_head', f'deconv2_{i}', 'bias'),
                     v[i:i + 1])
    else:
        skipped.append(key)


def _convert_shared_head(parts, v, params, stats, skipped, key):
    """C4 ResLayer shared head (shared_heads/res_layer.py): layer4.<i>
    bottlenecks with BN, mapped like the backbone's residual blocks."""
    if not re.match(r'layer\d$', parts[0]):
        skipped.append(key)
        return
    block = f'{parts[0]}/{parts[1]}'
    sub = parts[2]
    prefix = ('shared_head', block)
    if sub.startswith('conv'):
        _set(params, prefix + (sub, 'kernel'), _conv_kernel(v))
    elif sub.startswith('bn'):
        _bn(parts, v, params, stats, prefix + (sub,))
    elif sub == 'downsample':
        if parts[3] == '0':
            _set(params, prefix + ('downsample_conv', 'kernel'),
                 _conv_kernel(v))
        else:
            _bn(parts, v, params, stats, prefix + ('downsample_bn',))
    else:
        skipped.append(key)


def _convert_maskiou_head(parts, v, params, skipped, key):
    """Mask-IoU head (mask_heads/maskiou_head.py): convs.N + fcs.N +
    fc_mask_iou. The first fc flattens (C, 7, 7) torch-order features."""
    leaf = parts[-1]
    if parts[0] == 'convs':
        _set(params, ('mask_iou_head', f'conv_{parts[1]}',
                      'kernel' if leaf == 'weight' else 'bias'),
             _conv_kernel(v) if leaf == 'weight' else v)
    elif parts[0] == 'fcs':
        if leaf == 'weight':
            k = _roi_flat_fc_kernel(v) if parts[1] == '0' else _fc_kernel(v)
            _set(params, ('mask_iou_head', f'fc_{parts[1]}', 'kernel'), k)
        else:
            _set(params, ('mask_iou_head', f'fc_{parts[1]}', 'bias'), v)
    elif parts[0] == 'fc_mask_iou':
        _set(params, ('mask_iou_head', 'fc_mask_iou',
                      'kernel' if leaf == 'weight' else 'bias'),
             _fc_kernel(v) if leaf == 'weight' else v)
    else:
        skipped.append(key)


def _convert_semantic_head(parts, v, params, skipped, key):
    """HTC fused semantic head (mask_heads/fused_semantic_head.py):
    lateral_convs.N.conv + convs.N.conv + conv_embedding.conv +
    conv_logits (norm-free ConvModules)."""
    leaf = parts[-1]
    if parts[0] in ('lateral_convs', 'convs'):
        name = f'{parts[0]}_{parts[1]}'
        _set(params, ('semantic_head', name,
                      'kernel' if leaf == 'weight' else 'bias'),
             _conv_kernel(v) if leaf == 'weight' else v)
    elif parts[0] in ('conv_embedding', 'conv_logits'):
        _set(params, ('semantic_head', parts[0],
                      'kernel' if leaf == 'weight' else 'bias'),
             _conv_kernel(v) if leaf == 'weight' else v)
    else:
        skipped.append(key)


def _convert_head(parts, v, params, skipped, key):
    # cascade R-CNN: bbox_head.<stage>.<...> (torch ModuleList)
    if parts[0].isdigit():
        if not _convfc_leaf(parts[1:], v, params, f'bbox_head_{parts[0]}'):
            skipped.append(key)
        return
    # two-stage ConvFC box head (convfc_bbox_head.py): shared FCs + heads
    if _convfc_leaf(parts, v, params, 'bbox_head'):
        return
    # Double-Head box head (double_bbox_head.py:10-117): BasicResBlock
    # (ConvModules conv1/conv2/conv_identity with GN) + Bottleneck
    # conv_branch list + fc_branch Linears
    if parts[0] == 'res_block':
        sub, mod, leaf = parts[1], parts[2], parts[-1]
        if mod == 'conv':
            _set(params, ('bbox_head', 'res_block', sub,
                          'kernel' if leaf == 'weight' else 'bias'),
                 _conv_kernel(v) if leaf == 'weight' else v)
        else:                                  # gn
            _set(params, ('bbox_head', 'res_block',
                          sub.replace('conv', 'gn'),
                          'scale' if leaf == 'weight' else 'bias'), v)
        return
    if parts[0] == 'conv_branch':
        idx, sub, leaf = parts[1], parts[2], parts[-1]
        tgt = ('bbox_head', f'conv_branch_{idx}')
        if sub.startswith('conv'):
            _set(params, tgt + (sub, 'kernel'), _conv_kernel(v))
        elif sub.startswith('gn'):
            _set(params, tgt + (sub,
                                'scale' if leaf == 'weight' else 'bias'), v)
        else:
            skipped.append(key)
        return
    if parts[0] == 'fc_branch':
        idx, leaf = parts[1], parts[-1]
        if leaf == 'weight':
            k = _roi_flat_fc_kernel(v) if idx == '0' else _fc_kernel(v)
            _set(params, ('bbox_head', f'fc_branch_{idx}', 'kernel'), k)
        else:
            _set(params, ('bbox_head', f'fc_branch_{idx}', 'bias'), v)
        return
    # guided-anchoring retina head submodules (ga_retina_head.py)
    if _ga_leaf(parts, v, params, ('head',)):
        return
    if parts[0] == 'moment_transfer':
        _set(params, ('head', 'moment_transfer'), v)
        return
    m = re.match(r'(cls|reg)_convs$', parts[0])
    if m:
        name = f'{m.group(1)}_convs_{parts[1]}'
        mod, leaf = parts[2], parts[3] if len(parts) > 3 else None
        if mod in ('weight', 'bias'):
            # plain per-level conv lists (reference ssd_head.py:47-48)
            _set(params, ('head', name, 'kernel' if mod == 'weight'
                          else 'bias'),
                 _conv_kernel(v) if mod == 'weight' else v)
        elif mod == 'conv':
            if leaf == 'weight':
                _set(params, ('head', name, 'conv', 'kernel'),
                     _conv_kernel(v))
            else:
                _set(params, ('head', name, 'conv', 'bias'), v)
        elif mod == 'gn':
            _set(params, ('head', name, 'gn',
                          'scale' if leaf == 'weight' else 'bias'), v)
        else:
            skipped.append(key)
        return
    # serial/parallel init-refine heads (reppoints_head_kp_serial.py:143-170)
    if re.match(r'(cls|keypts|reppts)_(init|refine)_dfmconv$', parts[0]):
        _set(params, ('head', parts[0]), _dcn_kernel(v))
        return
    if parts[0] in ('keypts_init_conv', 'reppts_init_conv'):
        leaf = 'kernel' if parts[1] == 'weight' else 'bias'
        _set(params, ('head', parts[0], leaf),
             _conv_kernel(v) if leaf == 'kernel' else v)
        return
    if re.match(r'(cls|keypts|reppts)_(init|refine)_out$', parts[0]):
        leaf = 'kernel' if parts[1] == 'weight' else 'bias'
        _set(params, ('head', parts[0], leaf),
             _dense_kernel(v) if leaf == 'kernel' else v)
        return
    # FCOS head (fcos_head.py:80-85): 3x3 convs + per-level Scale params
    if parts[0] in ('fcos_cls', 'fcos_reg', 'fcos_centerness'):
        leaf = 'kernel' if parts[1] == 'weight' else 'bias'
        _set(params, ('head', parts[0], leaf),
             _conv_kernel(v) if leaf == 'kernel' else v)
        return
    if parts[0] == 'scales':
        # scales.<level>.scale scalars -> assembled into the flax 'scales'
        # vector by convert_state_dict's finalize pass
        _set(params, ('head', '_scales_tmp', parts[1]), v.reshape(()))
        return
    m = re.match(r'kp_rep_block_(\d)$', parts[0])
    if m:
        block = parts[0]
        mod, leaf = parts[1], parts[2]
        if re.match(r'(cls|keypts)_dfmconv(_\d)?$', mod):
            # multi-column heads suffix the kernel size (cls_dfmconv_3/5/7);
            # the Kp1Rep single-column head does not (kp1rep head :49-57)
            assert leaf == 'weight'
            _set(params, ('head', block, mod), _dcn_kernel(v))
        elif mod in ('cls_out', 'keypts_out', 'reppts_out'):
            if leaf == 'weight':
                _set(params, ('head', block, mod, 'kernel'),
                     _dense_kernel(v))
            else:
                _set(params, ('head', block, mod, 'bias'), v)
        elif mod in ('cls_conv', 'keypts_conv'):
            if leaf == 'weight':
                _set(params, ('head', block, mod, 'kernel'), _conv_kernel(v))
            else:
                _set(params, ('head', block, mod, 'bias'), v)
        else:
            skipped.append(key)
        return
    skipped.append(key)


def load_pth(path: str):
    """Load an mmcv .pth checkpoint's model state_dict (CPU torch)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    state = ckpt.get('state_dict', ckpt)
    return {k.replace('module.', '', 1) if k.startswith('module.') else k: v
            for k, v in state.items()}


def convert_pth(path: str):
    """Full .pth -> (params, batch_stats, skipped) pipeline."""
    return convert_state_dict(load_pth(path))


def merge_into_variables(variables, params, batch_stats, strict=True):
    """Overlay converted tensors onto initialized model variables.

    Verifies shape agreement leaf-by-leaf; with strict=True, every converted
    leaf must exist in the target tree.
    """
    import jax

    def overlay(dst, src, path=''):
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                if strict:
                    raise KeyError(f'{path}/{k} not in target tree')
                continue
            if isinstance(v, dict):
                out[k] = overlay(out[k], v, f'{path}/{k}')
            else:
                tgt = np.asarray(out[k])
                if tgt.shape != v.shape:
                    raise ValueError(
                        f'{path}/{k}: shape {v.shape} != target {tgt.shape}')
                out[k] = v.astype(tgt.dtype)
        return out

    new_vars = dict(variables)
    new_vars['params'] = overlay(variables['params'], params)
    if batch_stats:
        new_vars['batch_stats'] = overlay(
            variables.get('batch_stats', {}), batch_stats)
    return new_vars
