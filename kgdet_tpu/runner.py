"""Training runner: epoch loop, logging, checkpointing, eval hook.

The TPU-native equivalent of mmcv Runner + mmdet train_detector
(reference mmdet/apis/train.py:137-221): single-controller JAX, explicit
state, canvas-bucketed jitted train steps, Orbax checkpoints, JSONL +
text logging, per-epoch COCO eval. Deterministic given (seed, data).
"""
from __future__ import annotations

import json
import os
import time
from collections import deque
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import KGDetConfig
from kgdet_tpu.data.dataset import DeepFashion2Dataset
from kgdet_tpu.data.loader import DataLoader
from kgdet_tpu.eval_loop import run_eval
from kgdet_tpu.parallel.train import (
    make_lr_schedule, make_mesh, make_optimizer, make_train_step, replicate,
    shard_batch)
from kgdet_tpu.utils.checkpoint import CheckpointManager


class TrainLogger:
    """Rank-0 text + JSONL logging (parity: mmcv TextLoggerHook + JSON log)."""

    def __init__(self, work_dir: str, interval: int = 50, enabled=True):
        self.interval = interval
        self.enabled = enabled and jax.process_index() == 0
        self.buffer: deque = deque(maxlen=interval)
        self.jsonl_path = os.path.join(work_dir, 'train_log.jsonl')
        if self.enabled:
            os.makedirs(work_dir, exist_ok=True)

    def log_iter(self, epoch, it, total_iters, logs: Dict[str, Any], lr,
                 imgs_per_sec):
        # Buffer the DEVICE arrays and pull once per interval (mmcv
        # LogBuffer behavior). A float(v) per key per iteration would be a
        # host sync every step (>=35 ms each through the axon relay),
        # serializing dispatch and defeating the device-prefetch queue.
        self.buffer.append(logs)
        if not self.enabled or (it + 1) % self.interval:
            return
        host = jax.device_get(list(self.buffer))   # one sync per interval
        avg = {k: float(np.mean([b[k] for b in host]))
               for k in host[0]}
        msg = (f'Epoch [{epoch + 1}][{it + 1}/{total_iters}] '
               f'lr: {lr:.5f}, loss: {avg["loss"]:.4f}, '
               f'img/s: {imgs_per_sec:.1f}')
        keys = [k for k in sorted(avg) if k.startswith('loss_')]
        msg += ''.join(f', {k}: {avg[k]:.4f}' for k in keys)
        # RCNN classification accuracy (reference TextLoggerHook prints the
        # bbox head's 'acc' next to the losses)
        msg += ''.join(f', {k}: {avg[k]:.2f}' for k in sorted(avg)
                       if k == 'acc' or k.startswith('acc_'))
        print(msg, flush=True)
        rec = dict(mode='train', epoch=epoch + 1, iter=it + 1, lr=float(lr),
                   imgs_per_sec=float(imgs_per_sec), **avg)
        with open(self.jsonl_path, 'a') as f:
            f.write(json.dumps(rec) + '\n')

    def log_eval(self, epoch, stats: Dict[str, Dict[str, float]]):
        if not self.enabled:
            return
        for iou_type, s in stats.items():
            # mmdet-style copypaste line
            line = ' '.join(f'{s[k]:.4f}' for k in
                            ('AP', 'AP50', 'AP75') if k in s)
            print(f'Epoch [{epoch + 1}] {iou_type}_mAP_copypaste: {line}',
                  flush=True)
        rec = {'mode': 'val', 'epoch': epoch + 1}
        for iou_type, s in stats.items():
            rec.update({f'{iou_type}_{k}': float(v) for k, v in s.items()})
        with open(self.jsonl_path, 'a') as f:
            f.write(json.dumps(rec) + '\n')


class Runner:
    """Owns model/optimizer/checkpoint state and the epoch loop."""

    def __init__(self, cfg: KGDetConfig, work_dir: Optional[str] = None,
                 n_devices: Optional[int] = None, log_interval: int = 50,
                 val_dataset=None):
        self.cfg = cfg
        self.work_dir = work_dir or cfg.work_dir
        self.model = build_model(cfg)
        self.mesh = make_mesh(n_devices)
        self.logger = TrainLogger(self.work_dir, log_interval)
        self.ckpt = CheckpointManager(
            os.path.join(self.work_dir, 'checkpoints'))
        self.val_dataset = val_dataset

        self.train_dataset = None
        self.train_loader = None
        self.steps_per_epoch = None
        self.tx = None
        self.schedule = None
        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self.step = 0
        self.epoch = 0
        self._step_fns: Dict[tuple, Any] = {}

    # ------------------------------------------------------------ state init
    def setup(self, init_from_variables: Optional[Dict] = None,
              resume: bool = False, train_dataset=None):
        cfg = self.cfg
        if train_dataset is None:
            train_dataset = DeepFashion2Dataset(cfg.train_data, train=True)
        self.train_dataset = train_dataset
        per_host_batch = max(
            cfg.train_data.batch_size // jax.process_count(), 1)
        n_mesh = self.mesh.devices.size
        if per_host_batch % n_mesh:
            raise ValueError(
                f'per-host batch {per_host_batch} not divisible by the '
                f'{n_mesh}-device dp mesh; adjust train_data.batch_size or '
                f'pass n_devices')
        self.train_loader = DataLoader(
            train_dataset, per_host_batch, train=True, seed=cfg.seed,
            num_shards=jax.process_count(), shard_id=jax.process_index())
        self.steps_per_epoch = len(self.train_loader)

        if init_from_variables is None:
            variables = init_variables(self.model, cfg)
        else:
            variables = init_from_variables
        self.params = variables['params']
        self.batch_stats = variables.get('batch_stats', {})
        self.tx, self.schedule = make_optimizer(
            cfg, self.params, self.steps_per_epoch)
        self.opt_state = self.tx.init(self.params)

        if resume:
            latest = self.ckpt.latest_step()
            if latest is not None:
                state = self.ckpt.restore(latest, self._state_dict())
                self._load_state(state)
                if self.logger.enabled:
                    print(f'[runner] resumed from step {latest} '
                          f'(epoch {self.epoch})', flush=True)

        # replicate over the mesh
        self.params = replicate(self.mesh, self.params)
        self.batch_stats = replicate(self.mesh, self.batch_stats)
        self.opt_state = replicate(self.mesh, self.opt_state)

    def _state_dict(self):
        return {
            'params': self.params,
            'batch_stats': self.batch_stats,
            'opt_state': self.opt_state,
            'step': np.asarray(self.step, np.int64),
            'epoch': np.asarray(self.epoch, np.int64),
        }

    def _load_state(self, state):
        self.params = state['params']
        self.batch_stats = state['batch_stats']
        self.opt_state = state['opt_state']
        self.step = int(state['step'])
        self.epoch = int(state['epoch'])

    # ------------------------------------------------------------ train step
    def _get_step_fn(self, canvas):
        if canvas not in self._step_fns:
            fn = make_train_step(self.model, self.cfg, canvas, self.tx)
            self._step_fns[canvas] = jax.jit(fn, donate_argnums=(0, 2))
        return self._step_fns[canvas]

    def _device_prefetch(self, iterator, depth: int = 2):
        """Stage host batches on device ahead of the step (overlaps the
        host->device transfer with the previous step's compute)."""
        from collections import deque
        queue = deque()
        seed = self.cfg.seed * 100003 + self.step
        with self.mesh:
            for batch in iterator:
                # per-step sampler seed (two-stage random subsampling)
                batch = dict(batch, seed=np.int32(seed % (2 ** 31)))
                seed += 1
                queue.append(shard_batch(self.mesh, batch))
                if len(queue) > depth:
                    yield queue.popleft()
            while queue:
                yield queue.popleft()

    def train_epoch(self):
        cfg = self.cfg
        self.train_loader.set_epoch(self.epoch)
        t_last = time.time()
        n_imgs = 0
        for it, batch in enumerate(
                self._device_prefetch(iter(self.train_loader))):
            canvas = tuple(batch['image'].shape[1:3])
            step_fn = self._get_step_fn(canvas)
            with self.mesh:
                self.params, self.opt_state, logs = step_fn(
                    self.params, self.batch_stats, self.opt_state, batch)
            self.step += 1
            n_imgs += batch['image'].shape[0]
            if (it + 1) % self.logger.interval == 0:
                jax.block_until_ready(logs['loss'])
                dt = time.time() - t_last
                ips = n_imgs * jax.process_count() / max(dt, 1e-9)
                lr = float(self.schedule(self.step - 1))
                self.logger.log_iter(self.epoch, it, self.steps_per_epoch,
                                     logs, lr, ips)
                t_last = time.time()
                n_imgs = 0
            else:
                self.logger.log_iter(self.epoch, it, self.steps_per_epoch,
                                     logs, 0.0, 0.0)
        self.epoch += 1

    def save_checkpoint(self, wait: bool = False):
        self.ckpt.save(self.step, self._state_dict(), wait=wait)

    def evaluate(self, verbose: bool = True):
        if self.val_dataset is None:
            self.val_dataset = DeepFashion2Dataset(
                self.cfg.val_data, train=False)
        variables = {'params': self.params, 'batch_stats': self.batch_stats}
        stats, _ = run_eval(
            self.model, variables, self.cfg, self.val_dataset,
            out_prefix=os.path.join(self.work_dir,
                                    f'eval_epoch{self.epoch}'),
            verbose=verbose)
        return stats

    def run(self, validate: bool = False, max_epochs: Optional[int] = None):
        total = max_epochs or self.cfg.optim.total_epochs
        while self.epoch < total:
            self.train_epoch()
            self.save_checkpoint()
            if validate:
                stats = self.evaluate()
                self.logger.log_eval(self.epoch - 1, stats)
        self.ckpt.close()
