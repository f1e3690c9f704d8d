"""Runner integration: train epochs, checkpoint, resume, evaluate (tiny)."""
import glob
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from kgdet_tpu.config import DataConfig, OptimConfig
from kgdet_tpu.data.dataset import DeepFashion2Dataset
from kgdet_tpu.runner import Runner
from tests.common import TINY_CANVAS, tiny_cfg
from tests.test_data import make_synth_coco


@pytest.fixture(scope='module')
def synth_cfg(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp('runner_coco'))
    # landscape-only so a single canvas bucket (= one jit cache) is used
    ann_file = make_synth_coco(tmpdir, n_images=8, landscape_only=True)
    data = DataConfig(
        ann_file=ann_file, img_prefix=tmpdir,
        img_scale=(TINY_CANVAS[1], TINY_CANVAS[0]),
        max_gts=8, batch_size=2, flip_ratio=0.5,
        canvas_hw=(TINY_CANVAS,))
    cfg = tiny_cfg(num_keypts=294).replace(
        train_data=data, val_data=data,
        optim=OptimConfig(lr=1e-3, warmup_iters=2, total_epochs=2))
    return cfg


def test_runner_train_checkpoint_resume_eval(synth_cfg, tmp_path):
    work_dir = str(tmp_path / 'work')
    cfg = synth_cfg.replace(work_dir=work_dir)
    runner = Runner(cfg, work_dir=work_dir, log_interval=2, n_devices=2)
    runner.setup()
    assert runner.steps_per_epoch >= 2

    runner.train_epoch()
    runner.save_checkpoint(wait=True)
    step_after_1 = runner.step
    assert step_after_1 == runner.steps_per_epoch

    # logs written
    log_path = os.path.join(work_dir, 'train_log.jsonl')
    assert os.path.exists(log_path)
    recs = [json.loads(l) for l in open(log_path)]
    assert any(r['mode'] == 'train' and np.isfinite(r['loss']) for r in recs)

    # resume into a fresh runner
    runner2 = Runner(cfg, work_dir=work_dir, log_interval=2, n_devices=2)
    runner2.setup(resume=True)
    assert runner2.step == step_after_1
    assert runner2.epoch == 1
    runner2.train_epoch()
    assert runner2.step == 2 * runner.steps_per_epoch

    # eval end-to-end: inference -> JSON -> COCO mAP (untrained => low AP,
    # but the pipeline must produce finite stats and result files)
    stats = runner2.evaluate(verbose=False)
    assert 'bbox' in stats and 'keypoints' in stats
    assert np.isfinite(stats['bbox']['AP'])
    assert np.isfinite(stats['keypoints']['AP'])
    files = glob.glob(os.path.join(work_dir, 'eval_epoch*.bbox.json'))
    assert files
    dets = json.load(open(files[0]))
    if dets:
        assert {'image_id', 'bbox', 'score', 'category_id'} <= set(dets[0])
    runner2.ckpt.close()
    runner.ckpt.close()
