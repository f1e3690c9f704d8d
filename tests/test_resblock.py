"""Fused frozen-bottleneck kernel (ops/pallas_resblock.py) parity tests."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.ops.pallas_resblock import (
    bottleneck_reference, fold_bn, fused_bottleneck)


def _mk(cin, width, cout, H, W, B=2, ds=True, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, cin).astype(np.float32))
    w1 = jnp.asarray(rng.randn(cin, width).astype(np.float32) * .2)
    b1 = jnp.asarray(rng.randn(width).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.randn(3, 3, width, width).astype(np.float32) * .1)
    b2 = jnp.asarray(rng.randn(width).astype(np.float32) * .1)
    w3 = jnp.asarray(rng.randn(width, cout).astype(np.float32) * .2)
    b3 = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
    if ds:
        wd = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * .2)
        bd = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
    else:
        assert cin == cout
        wd = bd = None
    return x, (w1, b1, w2, b2, w3, b3, wd, bd)


@pytest.mark.parametrize('ds', [True, False])
def test_fused_kernel_matches_reference(ds):
    cin, width, cout = (8, 8, 16) if ds else (16, 8, 16)
    x, ws = _mk(cin, width, cout, H=16, W=16, ds=ds)
    ref = bottleneck_reference(x, *ws)
    got = fused_bottleneck(x, *ws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_kernel_boundary_rows_and_cols():
    # H == rt (single row step: both halos are out-of-image) and a
    # distinctive border pattern: catches halo-masking mistakes
    x, ws = _mk(8, 8, 16, H=8, W=8, B=1, ds=True, seed=3)
    x = x.at[:, 0].set(5.0).at[:, -1].set(-5.0)
    ref = bottleneck_reference(x, *ws)
    got = fused_bottleneck(x, *ws, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_bn_matches_sequential():
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    scale = jnp.asarray(rng.rand(6).astype(np.float32) + .5)
    bias = jnp.asarray(rng.randn(6).astype(np.float32))
    mean = jnp.asarray(rng.randn(6).astype(np.float32))
    var = jnp.asarray(rng.rand(6).astype(np.float32) + .5)
    x = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    wf, bf = fold_bn(k, scale, bias, mean, var)
    seq = (x @ k - mean) * (scale * jax.lax.rsqrt(var + 1e-5)) + bias
    np.testing.assert_allclose(np.asarray(x @ wf + bf), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_fused_module_matches_plain_bottleneck():
    """FusedBottleneck (reference path on CPU) == Bottleneck with the same
    params, and the param/stat trees are identical."""
    from kgdet_tpu.models.resnet import Bottleneck, FusedBottleneck

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8))
    plain = Bottleneck(planes=8, stride=1, downsample=True)
    fused = FusedBottleneck(planes=8, downsample=True)
    vp = plain.init(rng, x)
    vf = fused.init(rng, x)
    assert jax.tree.structure(vp) == jax.tree.structure(vf)
    for (kp, lp), (kf, lf) in zip(
            jax.tree_util.tree_leaves_with_path(vp),
            jax.tree_util.tree_leaves_with_path(vf)):
        assert kp == kf and lp.shape == lf.shape
    # seed non-trivial BN stats so folding is exercised
    stats = jax.tree.map(
        lambda a: a + 0.3 * jax.random.normal(jax.random.PRNGKey(2),
                                              a.shape) ** 2,
        vp['batch_stats'])
    vars_ = {'params': vp['params'], 'batch_stats': stats}
    out_p = plain.apply(vars_, x)
    out_f = fused.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-4, atol=2e-4)


def test_resnet50_frozen_stage_uses_fused_and_matches():
    """depth-50 ResNet with frozen_stages=1: the fused-module layer1 output
    equals the plain composition (calibration trace) bit-for-bit at the
    tree level and numerically at the output."""
    from kgdet_tpu.models.resnet import ResNet

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    net = ResNet(depth=50, out_indices=(0,), frozen_stages=1, s2d_stem=False)
    v = net.init(jax.random.PRNGKey(4), x)
    out_fused = net.apply(v, x)[0]
    # calibration trace (mutable intermediates) takes the plain Bottleneck
    # path — same params, same math modulo BN-folding associativity
    out_plain, _ = net.apply(v, x, mutable=['intermediates'])
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_plain[0]),
                               rtol=2e-4, atol=2e-4)
    # gradient does not flow into the frozen stage (stop_gradient'ed)
    def loss(params):
        return jnp.sum(net.apply(
            {'params': params, 'batch_stats': v['batch_stats']}, x)[0])
    g = jax.grad(loss)(v['params'])
    g1 = [leaf for path, leaf in jax.tree_util.tree_leaves_with_path(g)
          if 'layer1' in jax.tree_util.keystr(path)]
    assert g1 and all(float(jnp.abs(a).max()) == 0.0 for a in g1)
