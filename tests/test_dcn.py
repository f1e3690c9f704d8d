"""Backbone DCN: stride-2 deformable conv semantics + checkpoint mapping.

Parity: the reference applies DCN at conv2_stride (resnet.py:147-186) with a
stride-matched conv2_offset conv; converted checkpoints carry
backbone.layerN.i.conv2_offset.{weight,bias} plus a DCN-layout conv2.weight.
"""
import jax
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.models.resnet import Bottleneck
from kgdet_tpu.utils.torch_convert import convert_state_dict


def test_deform_conv_stride2_zero_offsets_matches_plain_conv():
    """With zero offsets, stride-2 DCN == plain 3x3/2 conv (pad 1)."""
    from jax import lax

    from kgdet_tpu.ops.deform import deform_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 11, 4).astype(np.float32))
    w_hwio = rng.randn(3, 3, 4, 6).astype(np.float32)
    # tap-major (9, Cin, Cout), row-major (dy, dx) taps
    w_taps = jnp.asarray(w_hwio.reshape(9, 4, 6))

    base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing='ij'),
                    axis=-1).reshape(9, 2).astype(np.float32)
    Ho, Wo = 5, 6     # ceil(9/2), ceil(11/2)
    rel = jnp.broadcast_to(jnp.asarray(base), (2, Ho, Wo, 9, 2))

    got = deform_conv(x, rel, w_taps, stride=2)
    want = lax.conv_general_dilated(
        x, jnp.asarray(w_hwio), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_dcn_stride2_block_shapes_and_converter_mapping():
    block = Bottleneck(planes=4, stride=2, downsample=True, use_dcn=True)
    x = jnp.zeros((1, 8, 8, 16))
    variables = jax.jit(block.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(block.apply)(variables, x)
    assert out.shape == (1, 4, 4, 16)

    p = variables['params']
    cin = 4
    rng = np.random.RandomState(1)
    state = {
        'backbone.layer2.0.conv2_offset.weight':
            rng.randn(18, cin, 3, 3).astype(np.float32),
        'backbone.layer2.0.conv2_offset.bias':
            rng.randn(18).astype(np.float32),
        'backbone.layer2.0.conv2.weight':
            rng.randn(4, cin, 3, 3).astype(np.float32),
    }
    params, stats, skipped = convert_state_dict(state)
    assert not skipped
    got = params['backbone']['layer2/0']['conv2']
    assert got['conv_offset']['kernel'].shape == \
        p['conv2']['conv_offset']['kernel'].shape
    assert got['conv_offset']['bias'].shape == \
        p['conv2']['conv_offset']['bias'].shape
    assert got['weight'].shape == p['conv2']['weight'].shape
    # tap-major layout: tap k of the converted weight is OIHW[:, :, k//3, k%3]
    src = state['backbone.layer2.0.conv2.weight']
    np.testing.assert_allclose(got['weight'][4],
                               np.transpose(src[:, :, 1, 1]), atol=0)
