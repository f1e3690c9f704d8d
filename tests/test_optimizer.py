"""Optimizer semantics: torch.optim parity and mmcv paramwise options.

The reference builds torch optimizers (mmdet/apis/train.py:63-134) where
weight decay is folded into the gradient BEFORE the momentum/moment update
(L2-into-grad, not decoupled AdamW). These tests step make_optimizer and
torch.optim side by side on the same params/grads.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from kgdet_tpu.config import OptimConfig
from kgdet_tpu.parallel.train import make_optimizer
from tests.common import tiny_cfg


def _mk_params(seed=0):
    rng = np.random.RandomState(seed)
    return {
        'head': {
            'conv': {'kernel': rng.randn(3, 3, 4, 4).astype(np.float32),
                     'bias': rng.randn(4).astype(np.float32)},
            'bn1': {'scale': rng.rand(4).astype(np.float32) + 0.5,
                    'bias': rng.randn(4).astype(np.float32)},
        }
    }


def _mk_grads(seed=1):
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: rng.randn(*p.shape).astype(np.float32), _mk_params())


def _cfg(**optim_kwargs):
    optim_kwargs.setdefault('warmup_iters', 0)
    optim_kwargs.setdefault('grad_clip_norm', 1e9)  # no-op clip
    return dataclasses.replace(tiny_cfg(), optim=OptimConfig(**optim_kwargs))


def _torch_steps(params, grads_per_step, opt_ctor, nsteps):
    flat, treedef = jax.tree_util.tree_flatten(params)
    tp = [torch.tensor(np.asarray(p), requires_grad=True) for p in flat]
    opt = opt_ctor(tp)
    for grads in grads_per_step:
        gflat = jax.tree_util.tree_leaves(grads)
        for t, g in zip(tp, gflat):
            t.grad = torch.tensor(np.asarray(g))
        opt.step()
    return jax.tree_util.tree_unflatten(
        treedef, [t.detach().numpy() for t in tp])


def _jax_steps(cfg, params, grads_per_step):
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=10 ** 6)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = tx.init(params)
    for grads in grads_per_step:
        updates, state = tx.update(
            jax.tree_util.tree_map(jnp.asarray, grads), state, params)
        params = optax_apply(params, updates)
    return jax.tree_util.tree_map(np.asarray, params)


def optax_apply(params, updates):
    return jax.tree_util.tree_map(lambda p, u: p + u, params, updates)


@pytest.mark.parametrize('wd', [0.0, 1e-2])
def test_adam_matches_torch(wd):
    params = _mk_params()
    grads = [_mk_grads(seed=s) for s in range(3)]
    got = _jax_steps(_cfg(type='adam', lr=1e-3, weight_decay=wd),
                     params, grads)
    want = _torch_steps(
        params, grads,
        lambda tp: torch.optim.Adam(tp, lr=1e-3, weight_decay=wd), 3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5),
        got, want)


def test_sgd_matches_torch():
    params = _mk_params()
    grads = [_mk_grads(seed=s) for s in range(3)]
    got = _jax_steps(_cfg(type='sgd', lr=1e-2, momentum=0.9,
                          weight_decay=1e-4), params, grads)
    want = _torch_steps(
        params, grads,
        lambda tp: torch.optim.SGD(tp, lr=1e-2, momentum=0.9,
                                   weight_decay=1e-4), 3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5),
        got, want)


def test_paramwise_bias_lr_mult():
    """Non-norm biases get bias_lr_mult x lr; norm params are untouched."""
    lr = 1e-2
    params = _mk_params()
    grads = _mk_grads()
    base = _jax_steps(_cfg(type='sgd', lr=lr, momentum=0.0, weight_decay=0.0),
                      params, [grads])
    mult = _jax_steps(_cfg(type='sgd', lr=lr, momentum=0.0, weight_decay=0.0,
                           bias_lr_mult=2.0), params, [grads])
    p = jax.tree_util.tree_map(np.asarray, params)
    # conv bias update doubled
    np.testing.assert_allclose(
        mult['head']['conv']['bias'] - p['head']['conv']['bias'],
        2.0 * (base['head']['conv']['bias'] - p['head']['conv']['bias']),
        rtol=1e-6, atol=1e-6)
    # conv kernel and norm bias unchanged vs base
    np.testing.assert_allclose(mult['head']['conv']['kernel'],
                               base['head']['conv']['kernel'], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(mult['head']['bn1']['bias'],
                               base['head']['bn1']['bias'], rtol=1e-6, atol=1e-6)


def test_paramwise_norm_decay_mult_zero():
    """norm_decay_mult=0 removes weight decay from bn/gn params only."""
    lr, wd = 1e-2, 1e-1
    params = _mk_params()
    zero_grads = jax.tree_util.tree_map(np.zeros_like, _mk_grads())
    out = _jax_steps(_cfg(type='sgd', lr=lr, momentum=0.0, weight_decay=wd,
                          norm_decay_mult=0.0, bias_decay_mult=0.5),
                     params, [zero_grads])
    p = jax.tree_util.tree_map(np.asarray, params)
    # norm params: no decay at all
    np.testing.assert_allclose(out['head']['bn1']['scale'],
                               p['head']['bn1']['scale'], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out['head']['bn1']['bias'],
                               p['head']['bn1']['bias'], rtol=1e-6, atol=1e-6)
    # conv kernel: full decay; conv bias: half decay
    np.testing.assert_allclose(
        out['head']['conv']['kernel'],
        p['head']['conv']['kernel'] * (1 - lr * wd), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        out['head']['conv']['bias'],
        p['head']['conv']['bias'] * (1 - lr * wd * 0.5), rtol=1e-6, atol=1e-6)
