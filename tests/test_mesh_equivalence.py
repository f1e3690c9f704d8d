"""dp-mesh equivalence: sharded training is the single-program computation.

design.md §4 claims gradients under the dp mesh are exactly the
single-program gradients at any device count (global-batch avg_factors +
XLA's gradient all-reduce). These tests enforce it: 2 train steps on a
1-device mesh vs an 8-device mesh must produce the same losses and params.

Also covers the multi-process eval gather (eval_loop.py:226) with a
2-"process" simulated allgather exchange.
"""
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.parallel.train import (
    make_mesh, make_optimizer, make_train_step, replicate, shard_batch)
from tests.common import TINY_CANVAS, synth_batch, tiny_cfg
from tests.test_two_stage import frcnn_cfg

CANVAS = TINY_CANVAS


def _run_steps(cfg, model, variables, batch_np, n_devices, nsteps=2):
    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=100)
    opt_state = tx.init(params)
    train_step = make_train_step(model, cfg, CANVAS, tx)
    mesh = make_mesh(n_devices)
    losses = []
    with mesh:
        params = replicate(mesh, params)
        stats = replicate(mesh, stats)
        opt_state = replicate(mesh, opt_state)
        batch = shard_batch(mesh, batch_np)
        step = jax.jit(train_step)
        for _ in range(nsteps):
            params, opt_state, logs = step(params, stats, opt_state, batch)
            losses.append(float(logs['loss']))
    return jax.tree_util.tree_map(np.asarray, params), losses


def _assert_tree_close(a, b, atol=1e-6):
    def chk(kp, x, y):
        np.testing.assert_allclose(
            x, y, atol=atol, rtol=1e-5,
            err_msg='/'.join(str(getattr(k, 'key', k)) for k in kp))
    jax.tree_util.tree_map_with_path(chk, a, b)


@pytest.mark.parametrize('family', ['kgdet', 'faster_rcnn'])
def test_dp_mesh_matches_single_device(family):
    if family == 'kgdet':
        cfg = tiny_cfg()
        batch = synth_batch(B=8)
    else:
        cfg = frcnn_cfg()
        batch = synth_batch(B=8)
        batch['seed'] = np.int32(7)  # two-stage sampler seed (replicated)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)

    p1, l1 = _run_steps(cfg, model, variables, batch, n_devices=1)
    p8, l8 = _run_steps(cfg, model, variables, batch, n_devices=8)

    np.testing.assert_allclose(l1, l8, rtol=1e-6, atol=1e-6)
    _assert_tree_close(p1, p8)


class _Exchange:
    """Simulated process_allgather: N threads stack their contributions."""

    def __init__(self, n):
        self.n = n
        self.barrier = threading.Barrier(n)
        self.bufs = {}

    def allgather(self, tid, x):
        self.bufs[tid] = np.asarray(x)
        self.barrier.wait()
        out = np.stack([self.bufs[i] for i in range(self.n)])
        self.barrier.wait()  # all read before the next round overwrites
        return out


def test_gather_results_across_processes(monkeypatch):
    from jax.experimental import multihost_utils
    from kgdet_tpu import eval_loop

    rng = np.random.RandomState(0)
    results = [
        {1: (rng.randn(3, 5).astype(np.float32), np.arange(3))},
        {2: (rng.randn(7, 5).astype(np.float32), np.arange(7)),
         3: (np.zeros((0, 5), np.float32), np.zeros((0,), np.int64))},
    ]
    ex = _Exchange(2)
    tls = threading.local()
    monkeypatch.setattr(jax, 'process_count', lambda: 2)
    monkeypatch.setattr(multihost_utils, 'process_allgather',
                        lambda x: ex.allgather(tls.tid, x))

    merged, errs = [None, None], [None, None]

    def worker(tid):
        tls.tid = tid
        try:
            merged[tid] = eval_loop.gather_results_across_processes(
                results[tid])
        except Exception as e:  # surfaced below
            errs[tid] = e

    threads = [threading.Thread(target=worker, args=(t,)) for t in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert errs == [None, None], errs

    want_keys = {1, 2, 3}
    for m in merged:
        assert m is not None and set(m.keys()) == want_keys
        np.testing.assert_array_equal(m[1][0], results[0][1][0])
        np.testing.assert_array_equal(m[2][0], results[1][2][0])
        assert m[3][0].shape == (0, 5)
