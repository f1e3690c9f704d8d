"""FrozenBatchNorm statistic calibration for from-scratch training.

The KGDet trunk runs BatchNorm with permanently frozen statistics
(norm_eval, reference resnet.py:518-525) — correct when loading pretrained
running stats, but from random init the frozen identity stats leave a deep
ResNet unnormalized: activation magnitudes compound across stages and
training diverges at practical learning rates (observed on the demo
overfit: NaN at epoch 13 with Adam 1e-3).

calibrate_frozen_bn is the from-scratch analog of loading pretrained
stats: it runs the model over a few batches, captures every
FrozenBatchNorm's input moments (sown into the 'intermediates' collection
by models/layers.py), pools them exactly (law of total variance), and
writes the result into batch_stats. One cheap pre-pass, after which the
trunk is genuinely normalized while staying a pure function.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


def _collect(inter, batch_stats, out, path=()):
    for k, v in inter.items():
        if isinstance(v, dict) and 'in_mean' in v:
            out.setdefault(path + (k,), []).append(
                (np.asarray(v['in_mean'][0], np.float64),
                 np.asarray(v['in_var'][0], np.float64)))
        elif isinstance(v, dict):
            _collect(v, batch_stats, out, path + (k,))


def calibrate_frozen_bn(model, variables, batches, passes: int = 1,
                        apply_kwargs=None):
    """Return variables with batch_stats set to real activation moments.

    batches: sequence of image arrays (each (B, H, W, 3), already
    normalized like training inputs). Moments are pooled over all batches.

    passes > 1 re-measures with the previous pass's stats applied. On
    shallow nets this refines the stats, but on a deep residual trunk the
    feedback DIVERGES (measured on R50: pass-2 variances blow up to ~1e11,
    pass-3 collapses to the floor and the forward goes NaN) — the default
    single pass already fixes the gross scale problem and yields a finite,
    well-ranged forward.
    """
    applied = 0
    for _ in range(max(passes - 1, 0)):
        variables, applied = _calibrate_once(model, variables, batches,
                                             apply_kwargs)
    return _calibrate_once(model, variables, batches, apply_kwargs)


def _calibrate_once(model, variables, batches: Iterable,
                    apply_kwargs=None):
    apply_kwargs = apply_kwargs or {}
    moments = {}
    for images in batches:
        from kgdet_tpu.ops.image import device_normalize
        _, state = model.apply(variables,
                               device_normalize(jnp.asarray(images)),
                               mutable=['intermediates'], **apply_kwargs)
        _collect(state['intermediates'], variables.get('batch_stats', {}),
                 moments)

    def _plain(tree):
        if hasattr(tree, 'items'):
            return {k: _plain(v) for k, v in tree.items()}
        return tree

    new_stats = _plain(variables.get('batch_stats', {}))
    applied = 0
    for path, ms in moments.items():
        means = np.stack([m for m, _ in ms])
        vars_ = np.stack([v for _, v in ms])
        # exact pooling: E[x^2] - E[x]^2 across equally-sized batches
        mean = means.mean(axis=0)
        var = (vars_ + means ** 2).mean(axis=0) - mean ** 2
        # find the matching batch_stats subtree (intermediates paths mirror
        # the module tree, batch_stats uses the same names)
        node = new_stats
        ok = True
        for k in path[:-1]:
            if k not in node:
                ok = False
                break
            node = node[k]
        if ok and path[-1] in node and 'mean' in node[path[-1]]:
            node[path[-1]] = {
                'mean': jnp.asarray(mean, jnp.float32),
                'var': jnp.asarray(np.maximum(var, 1e-6), jnp.float32),
            }
            applied += 1
    out = dict(variables)
    out['batch_stats'] = new_stats
    return out, applied
