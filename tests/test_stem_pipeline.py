"""Transposed stem->maxpool->layer1 pipeline (ops/pallas_stem.py) parity.

Oracle: the shipped XLA path — s2d_stem_conv (+folded bias, relu),
max_pool_3x3_s2, then bottleneck_reference per block.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from kgdet_tpu.models.layers import max_pool_3x3_s2
from kgdet_tpu.models.resnet import s2d_stem_conv
from kgdet_tpu.ops.pallas_resblock import bottleneck_reference
from kgdet_tpu.ops.pallas_stem import (
    ROWS_PER_STEP, bottleneck_transposed, from_interior,
    stem_layer1_pipeline, stem_pool_transposed, to_interior)


def _stem_weights(seed=0):
    rng = np.random.RandomState(seed)
    w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * .2)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * .1)
    return w, b


def _block_weights(cin, width, cout, ds, seed):
    """Weights in the bottleneck_reference convention + their transposed
    pipeline form."""
    rng = np.random.RandomState(seed)
    w1 = jnp.asarray(rng.randn(cin, width).astype(np.float32) * .2)
    b1 = jnp.asarray(rng.randn(width).astype(np.float32) * .1)
    w2 = jnp.asarray(rng.randn(3, 3, width, width).astype(np.float32) * .1)
    b2 = jnp.asarray(rng.randn(width).astype(np.float32) * .1)
    w3 = jnp.asarray(rng.randn(width, cout).astype(np.float32) * .2)
    b3 = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
    ref = [w1, b1, w2, b2, w3, b3]
    blk = {'w1': w1.T, 'b1': b1,
           'w2': jnp.transpose(w2.reshape(9, width, width), (0, 2, 1)),
           'b2': b2, 'w3': w3.T, 'b3': b3}
    if ds:
        wd = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * .2)
        bd = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
        ref += [wd, bd]
        blk['wd'], blk['bd'] = wd.T, bd
    else:
        ref += [None, None]
    return ref, blk


def _oracle_stem(x, w, b):
    y = s2d_stem_conv(x, w) + b
    return max_pool_3x3_s2(jnp.maximum(y, 0.0))


@pytest.mark.parametrize('H,W', [(32, 8), (64, 16)])
def test_stem_pool_matches_oracle(H, W):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))
    w, b = _stem_weights()
    ref = _oracle_stem(x, w, b)
    got = from_interior(stem_pool_transposed(x, w, b, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stem_pool_border_pattern():
    # distinctive borders: catches halo/padding mistakes at image edges
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 32, 12, 3).astype(np.float32))
    x = x.at[:, 0].set(5.0).at[:, -1].set(-5.0)
    x = x.at[:, :, 0].set(3.0).at[:, :, -1].set(-3.0)
    w, b = _stem_weights(seed=4)
    ref = _oracle_stem(x, w, b)
    got = from_interior(stem_pool_transposed(x, w, b, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('ds,n_steps', [(True, 1), (False, 2)])
def test_block_matches_reference(ds, n_steps):
    cin, width, cout = (8, 8, 16) if ds else (16, 8, 16)
    H, W4 = n_steps * ROWS_PER_STEP, 4
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, H, W4, cin).astype(np.float32))
    ref_ws, blk = _block_weights(cin, width, cout, ds, seed=6)
    ref = bottleneck_reference(x, *ref_ws)
    got = bottleneck_transposed(to_interior(x), **blk, interpret=True)
    np.testing.assert_allclose(np.asarray(from_interior(got)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_resnet_pipeline_wiring_matches_standard_path(monkeypatch):
    """ResNet with the pipeline forced on (interpret mode) == the shipped
    stem/FusedBottleneck path, with the SAME variable tree — proves the
    param paths, BN folding, and stage-0 skip wiring."""
    import functools

    import jax

    import kgdet_tpu.models.resnet as rn

    model = rn.ResNet(depth=50, num_stages=2, out_indices=(0, 1),
                      frozen_stages=1)
    x = jnp.asarray(np.random.RandomState(11)
                    .randn(1, 32, 16, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # randomize BN stats so folding is non-trivial
    rng = np.random.RandomState(12)
    variables = jax.tree.map(
        lambda v: jnp.asarray(rng.rand(*v.shape).astype(np.float32) + .5),
        variables)
    ref = model.apply(variables, x)
    monkeypatch.setattr(rn, 'use_stem_pipeline', lambda *a, **k: True)
    monkeypatch.setattr(
        rn, 'stem_layer1_pipeline',
        functools.partial(stem_layer1_pipeline, interpret=True))
    got = model.apply(variables, x)
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_gate_eligibility_at_production_shapes():
    """All shipped canvases must stay eligible (a silent gate regression
    would quietly hand the prefix back to the slow XLA path), and
    non-divisible / giant shapes must be rejected."""
    from kgdet_tpu.ops.pallas_stem import use_stem_pipeline
    for H, W in ((768, 1344), (800, 1344), (1344, 800)):
        for B in (1, 8):
            assert use_stem_pipeline(B, H, W, 2, platform='tpu'), (H, W)
    assert not use_stem_pipeline(8, 768, 1344, 2, platform='cpu')
    assert not use_stem_pipeline(1, 770, 1344, 2, platform='tpu')  # H%32
    assert not use_stem_pipeline(1, 768, 1342, 2, platform='tpu')  # W%4
    # f32 at the widest canvas blows the VMEM budget -> must fall back
    assert not use_stem_pipeline(1, 800, 1344, 4, platform='tpu')


def test_full_pipeline_matches_oracle():
    H, W = 64, 16
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))
    sw, sb = _stem_weights(seed=8)
    specs = [(64, 8, 32, True), (32, 8, 32, False), (32, 8, 32, False)]
    refs, blks = [], []
    for i, (cin, width, cout, ds) in enumerate(specs):
        r, b = _block_weights(cin, width, cout, ds, seed=10 + i)
        refs.append(r)
        blks.append(b)
    ref = _oracle_stem(x, sw, sb)
    for r in refs:
        ref = bottleneck_reference(ref, *r)
    got = stem_layer1_pipeline(x, sw, sb, blks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
