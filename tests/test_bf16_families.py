"""bf16 compute smoke test across every detector family."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.api import build_model, init_variables
from tests.common import TINY_CANVAS, tiny_cfg
from tests.test_retina import retina_cfg
from tests.test_fcos import fcos_cfg
from tests.test_two_stage import frcnn_cfg
from tests.test_variants import serial_cfg

CANVAS = TINY_CANVAS


def _cfgs():
    return {
        'kgdet': tiny_cfg(),
        'serial': serial_cfg('SerialKpHead'),
        'retina': retina_cfg(),
        'fcos': fcos_cfg(),
        'frcnn': frcnn_cfg(),
    }


@pytest.mark.parametrize('name', sorted(_cfgs()))
def test_bf16_forward_finite(name):
    cfg = _cfgs()[name].replace(compute_dtype='bfloat16')
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=CANVAS)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, CANVAS[0], CANVAS[1], 3), jnp.float32)
    out = jax.jit(model.apply)(variables, x)
    leaves = jax.tree.leaves(out)
    assert leaves, name
    for leaf in leaves:
        arr = np.asarray(leaf, dtype=np.float32)
        assert np.isfinite(arr).all(), name
