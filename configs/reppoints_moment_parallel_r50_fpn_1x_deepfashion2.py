"""Parallel keypoint RepPoints head on DeepFashion2 (init/refine ablation).

Same recipe as the serial config; the RepPoints fields come from independent
conv branches (parity: reppoints_head_kp_parallel.py; config
reppoints_moment_parallel_r50_fpn_1x-deepfashion2.py in the reference).
"""
import dataclasses as _dc
import os as _os
import runpy as _runpy

_base = _runpy.run_path(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)),
    'reppoints_moment_serial_r50_fpn_1x_deepfashion2.py'))
_cfg = _base['config']

config = _cfg.replace(
    head=_dc.replace(_cfg.head, type='ParallelKpHead'),
    work_dir='./work_dirs/reppoints_moment_parallel_r50_fpn_1x_deepfashion2',
)
