"""Orbax-backed checkpoint save/restore with epoch retention and resume.

TPU-native replacement for mmcv Runner.save_checkpoint / runner.resume
(reference mmdet/apis/train.py:182-185, tools/train.py:94-100): checkpoints
are Orbax pytrees holding params, frozen BN stats, optimizer state and
progress counters; `latest_step` gives --resume-from-latest semantics.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for train-state dicts."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = _abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, state: Dict[str, Any], wait: bool = False):
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mngr.wait_until_finished()

    def restore(self, step: int, template: Dict[str, Any]) -> Dict[str, Any]:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()


def save_params(path: str, variables: Dict[str, Any]):
    """One-shot save of model variables (params + batch_stats)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(_abspath(path), variables)
    ckpt.wait_until_finished()


def load_params(path: str, template: Optional[Dict[str, Any]] = None):
    path = _abspath(path)
    # CheckpointManager steps store the pytree under <step>/default
    if os.path.isdir(os.path.join(path, 'default')):
        path = os.path.join(path, 'default')
    ckpt = ocp.StandardCheckpointer()
    if template is None:
        return ckpt.restore(path)
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckpt.restore(path, abstract)
