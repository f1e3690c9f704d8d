"""Training step, optimizer, LR schedule, and data-parallel sharding.

TPU-native distribution model (vs the reference's one-process-per-GPU NCCL
setup, mmdet/apis/env.py + core/utils/dist_utils.py): single-controller JAX.
The batch is sharded over the 'dp' mesh axis with jax.sharding; params are
replicated; XLA inserts the gradient all-reduce. Loss avg_factors are computed
over the *global* batch, so gradients are exactly the single-program gradients
regardless of device count. Multi-host runs only need
jax.distributed.initialize() before building the mesh.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kgdet_tpu.config import KGDetConfig
from kgdet_tpu.ops.points import grid_points, valid_flags


# --------------------------------------------------------------- LR schedule
def make_lr_schedule(cfg, steps_per_epoch: int):
    """mmcv-style linear warmup + step decay at epoch boundaries.

    Parity: lr_config in configs/kgdet_moment_r50_fpn_1x-deepfashion2.py:133-138
    (warmup 500 iters from lr/3, x0.1 at epochs 8 and 11).
    """
    o = cfg.optim
    boundaries = jnp.asarray(
        [e * steps_per_epoch for e in o.lr_step_epochs], jnp.int32)

    def schedule(step):
        decay = o.lr_step_gamma ** jnp.sum(step >= boundaries)
        base = o.lr * decay
        frac = jnp.clip(step / max(o.warmup_iters, 1), 0.0, 1.0)
        k = (1 - frac) * (1 - o.warmup_ratio)
        warm = base * (1 - k)
        return jnp.where(step < o.warmup_iters, warm, base)

    return schedule


# ------------------------------------------------------------- frozen params
def frozen_param_mask(params, frozen_stages: int):
    """True for params that must NOT be updated (stem + stages <= frozen).

    Parity: ResNet._freeze_stages (reference resnet.py:466-475).
    """
    frozen_prefixes = []
    if frozen_stages >= 0:
        frozen_prefixes += ['backbone/conv1', 'backbone/bn1']
    for s in range(1, frozen_stages + 1):
        frozen_prefixes.append(f'backbone/layer{s}')

    def is_frozen(path):
        return any(path.startswith(p) for p in frozen_prefixes)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def mask_fn(tree):
        return jax.tree_util.tree_map_with_path(
            lambda kp, _: is_frozen(
                '/'.join(str(getattr(k, 'key', k)) for k in kp)), tree)
    return mask_fn(params)


def paramwise_multipliers(params, o):
    """(lr_mult, decay_mult) trees from mmcv-style paramwise options.

    Parity: build_optimizer's paramwise_options
    (reference mmdet/apis/train.py:63-134): params under a norm module
    (component named bn*/gn*) get norm_decay_mult on weight decay; other
    biases get bias_lr_mult on lr and bias_decay_mult on weight decay.
    """
    import re

    def classify(kp):
        parts = [str(getattr(k, 'key', k)) for k in kp]
        if any(re.fullmatch(r'(bn|gn)\d*', p) for p in parts[:-1]):
            return 1.0, o.norm_decay_mult
        if parts[-1] == 'bias':
            return o.bias_lr_mult, o.bias_decay_mult
        return 1.0, 1.0

    lr_mult = jax.tree_util.tree_map_with_path(
        lambda kp, _: classify(kp)[0], params)
    decay_mult = jax.tree_util.tree_map_with_path(
        lambda kp, _: classify(kp)[1], params)
    return lr_mult, decay_mult


def _add_weighted_decay(weight_decay, decay_mult):
    """add_decayed_weights with a per-param decay multiplier tree."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params):
        updates = jax.tree_util.tree_map(
            lambda g, p, m: g + weight_decay * m * p,
            updates, params, decay_mult)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_per_param(mult):
    """Elementwise per-param update scale (mmcv per-group lr multiplier)."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(
            lambda g, m: g * m, updates, mult), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: KGDetConfig, params, steps_per_epoch: int):
    """SGD + momentum + wd 1e-4 + global-norm clip 35 + warmup/step LR.

    Parity: optimizer/optimizer_config in the reference config:129-131 and
    DistOptimizerHook (dist_utils.py:44-58). Frozen-stage params get zero
    updates (the JAX equivalent of requires_grad=False).

    Both sgd and adam fold weight decay into the gradient BEFORE the
    momentum/moment update (torch.optim semantics, not decoupled AdamW), so
    a converted checkpoint trains identically to the reference recipe.
    Paramwise bias/norm lr/decay multipliers mirror mmcv's build_optimizer
    param groups (see paramwise_multipliers).
    """
    o = cfg.optim
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    frozen = frozen_param_mask(params, cfg.backbone.frozen_stages)
    lr_mult, decay_mult = paramwise_multipliers(params, o)
    paramwise = any(m != 1.0 for m in
                    jax.tree_util.tree_leaves((lr_mult, decay_mult)))
    decay = (_add_weighted_decay(o.weight_decay, decay_mult) if paramwise
             else optax.add_decayed_weights(o.weight_decay))
    if o.type == 'sgd':
        scale_steps = [decay, optax.trace(decay=o.momentum, nesterov=False)]
    elif o.type == 'adam':
        # L2-into-grad before the moment update = torch.optim.Adam
        scale_steps = [decay, optax.scale_by_adam()]
    else:
        raise ValueError(f'unknown optimizer type: {o.type}')
    tx = optax.chain(
        optax.clip_by_global_norm(o.grad_clip_norm),
        *scale_steps,
        optax.scale_by_learning_rate(schedule),
        *([_scale_per_param(lr_mult)] if paramwise else []),
        optax.masked(optax.set_to_zero(), frozen),
    )
    return tx, schedule


# ------------------------------------------------------------------ targets
def build_level_geometry(cfg: KGDetConfig, canvas_hw):
    """Static per-level grids for a padded canvas."""
    H, W = canvas_hw
    grids = []
    for stride in cfg.head.point_strides:
        fh, fw = -(-H // stride), -(-W // stride)
        grids.append(grid_points(fh, fw, stride))
    return grids


def batch_valid_flags(cfg: KGDetConfig, canvas_hw, valid_hw):
    """(B, P) per-level valid masks from per-image padded extents (pixels)."""
    H, W = canvas_hw
    outs = []
    for stride in cfg.head.point_strides:
        fh, fw = -(-H // stride), -(-W // stride)
        vh = jnp.ceil(valid_hw[:, 0] / stride).astype(jnp.int32)
        vw = jnp.ceil(valid_hw[:, 1] / stride).astype(jnp.int32)
        outs.append(jax.vmap(lambda a, b: valid_flags(fh, fw, a, b))(vh, vw))
    return outs


# --------------------------------------------------------------- train step
def compute_loss(outs, grids, valids, batch, cfg: KGDetConfig,
                 canvas_hw=None):
    """Dispatch target building + loss through the head-family registry."""
    from kgdet_tpu.models.families import get_head_family
    return get_head_family(cfg.head.type).loss(
        outs, grids, valids, batch, cfg, canvas_hw)


def make_train_step(model, cfg: KGDetConfig, canvas_hw, tx):
    """Build the jittable (state, batch) -> (state, logs) train step.

    For the two-stage family the batch may carry a scalar 'seed' feeding the
    proposal/RoI random samplers (defaults to 0 when absent).
    """
    grids = build_level_geometry(cfg, canvas_hw)

    def loss_fn(params, batch_stats, batch):
        from kgdet_tpu.models.families import is_two_stage
        from kgdet_tpu.ops.image import device_normalize
        image = device_normalize(batch['image'], batch['valid_hw'])
        if is_two_stage(cfg.detector_type):
            from kgdet_tpu.core.two_stage_loss import two_stage_loss_fn
            from kgdet_tpu.ops.anchors import anchor_valid_flags

            apply_kw = {}
            if 'proposals' in batch:        # Fast R-CNN external proposals
                apply_kw = dict(proposals=batch['proposals'],
                                proposals_valid=batch['proposals_valid'])
            fwd = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                image, batch['valid_hw'].astype(jnp.float32),
                train=True, **apply_kw)
            H, W = canvas_hw
            A = len(cfg.head.anchor_scales) * len(cfg.head.anchor_ratios)
            valids = []
            for stride in cfg.head.point_strides:
                fh, fw = -(-H // stride), -(-W // stride)
                vh = jnp.ceil(
                    batch['valid_hw'][:, 0] / stride).astype(jnp.int32)
                vw = jnp.ceil(
                    batch['valid_hw'][:, 1] / stride).astype(jnp.int32)
                valids.append(jax.vmap(
                    lambda a, b: anchor_valid_flags(fh, fw, A, a, b))(
                        vh, vw))
            rng = jax.random.PRNGKey(batch.get('seed', 0))
            return two_stage_loss_fn(cfg.detector_type)(
                fwd, batch, rng, cfg, valids, canvas_hw=canvas_hw)

        outs = model.apply(
            {'params': params, 'batch_stats': batch_stats}, image)
        valids = batch_valid_flags(cfg, canvas_hw, batch['valid_hw'])
        total, logs = compute_loss(outs, grids, valids, batch, cfg,
                                   canvas_hw=canvas_hw)
        return total, logs

    def train_step(params, batch_stats, opt_state, batch):
        (loss, logs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        logs['loss'] = loss
        logs['grad_norm'] = optax.global_norm(grads)
        return params, opt_state, logs

    return train_step


# ------------------------------------------------------------------ sharding
def make_mesh(n_devices: Optional[int] = None, axis: str = 'dp'):
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f'requested {n_devices}-device mesh but only {len(devs)} '
                f'device(s) are visible ({jax.default_backend()} backend)')
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def shard_batch(mesh: Mesh, batch: Dict[str, Any], axis: str = 'dp'):
    """Shard batch-major arrays over dp; replicate scalars.

    Raises on a non-divisible leading dim instead of silently replicating:
    a batch-size/mesh mismatch here would otherwise degrade into N copies of
    the full batch with no error anywhere downstream.
    """
    sharded = NamedSharding(mesh, P(axis))
    replicated = NamedSharding(mesh, P())
    n = mesh.devices.size

    def put(x):
        import numpy as _np
        x = _np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated)
        if x.shape[0] % n != 0:
            raise ValueError(
                f'shard_batch: leading dim {x.shape[0]} not divisible by '
                f'the {n}-device {axis!r} mesh axis (shape {x.shape})')
        return jax.device_put(x, sharded)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
