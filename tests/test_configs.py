"""Every shipped config loads, resolves through the family registry, and
builds its model module.

Guards the config surface the reference exercises via `Config.fromfile`
(mmdetection/tools/train.py:54): a field rename in KGDetConfig or a family
de-registration must fail here, not at user train time. Module construction
is lazy in flax, so this sweep stays cheap (no params are initialized).
"""
import glob
import os

import pytest

from kgdet_tpu.api import build_model
from kgdet_tpu.config import load_config
from kgdet_tpu.models.families import (
    HEAD_FAMILIES, is_two_stage, two_stage_decoder)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, '*.py')))


def test_config_dir_nonempty():
    assert len(CONFIGS) >= 17, CONFIGS


@pytest.mark.parametrize(
    'path', CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_loads_and_builds(path):
    cfg = load_config(path)
    if is_two_stage(cfg.detector_type):
        # decode dispatch must resolve for the declared detector type
        assert two_stage_decoder(cfg.detector_type) is not None
    else:
        assert cfg.head.type in HEAD_FAMILIES, (
            f'{os.path.basename(path)}: unregistered head family '
            f'{cfg.head.type}')
    model = build_model(cfg)
    assert model is not None
