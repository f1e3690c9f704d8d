"""High-level API: build/init models, jitted predict & train functions.

Parity surface: mmdet.apis (init_detector / inference_detector / train_detector,
reference mmdet/apis/train.py:47-221, inference.py:16-96) re-expressed as pure
functions over explicit state.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.config import KGDetConfig
from kgdet_tpu.core.postprocess import decode_detections
from kgdet_tpu.models.detector import KGDetDetector
from kgdet_tpu.parallel.train import build_level_geometry


def build_model(cfg: KGDetConfig):
    return KGDetDetector(cfg)


def init_variables(model, cfg: KGDetConfig, rng=None, canvas_hw=(64, 64)):
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed)
    x = jnp.zeros((1, canvas_hw[0], canvas_hw[1], 3), jnp.float32)
    variables = model.init(rng, x)
    return dict(variables)


def make_predict_fn(model, cfg: KGDetConfig, canvas_hw):
    """Jitted (variables, batch) -> padded detections on device.

    batch needs: image (B, H, W, 3), img_hw (B, 2) resized extents,
    scale_factor (B,).
    """
    grids = build_level_geometry(cfg, canvas_hw)

    @jax.jit
    def predict(variables, batch):
        outs = model.apply(variables, batch['image'])
        return decode_detections(
            outs, grids, batch['img_hw'], batch['scale_factor'], cfg.test,
            num_keypts=cfg.head.num_keypts)

    return predict


def make_forward_fn(model, cfg: KGDetConfig):
    """Raw jitted forward (for benchmarking / feature extraction)."""

    @jax.jit
    def forward(variables, images):
        return model.apply(variables, images)

    return forward
