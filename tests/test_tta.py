"""Dataset-level multi-scale/flip TTA: variant generation, merge-before-NMS."""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from kgdet_tpu.api import build_model, init_variables
from kgdet_tpu.config import DataConfig
from kgdet_tpu.data.dataset import DeepFashion2Dataset
from kgdet_tpu.eval_loop import (
    TTAVariant, evaluate_results, run_eval, run_inference_tta)
from tests.common import TINY_CANVAS, tiny_cfg
from tests.test_data import make_synth_coco


@pytest.fixture(scope='module')
def tta_setup(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp('tta_coco'))
    ann_file = make_synth_coco(tmpdir, n_images=4, landscape_only=True)
    data = DataConfig(
        ann_file=ann_file, img_prefix=tmpdir,
        img_scale=(TINY_CANVAS[1], TINY_CANVAS[0]),
        max_gts=8, batch_size=2, flip_ratio=0.0, canvas_hw=(TINY_CANVAS,))
    cfg = tiny_cfg(num_keypts=294).replace(train_data=data, val_data=data)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=TINY_CANVAS)
    ds = DeepFashion2Dataset(data, train=False)
    return cfg, model, variables, ds


def test_tta_variant_views(tta_setup):
    _, _, _, ds = tta_setup
    base = ds.prepare_test(0)
    flipped = TTAVariant(ds, flip=True).prepare_test(0)
    rw = int(base['img_hw'][1])
    np.testing.assert_allclose(flipped['image'][:, :rw],
                               base['image'][:, :rw][:, ::-1], atol=1e-6)
    half = TTAVariant(ds, img_scale=(TINY_CANVAS[1] // 2,
                                     TINY_CANVAS[0] // 2)).prepare_test(0)
    assert half['scale_factor'] < base['scale_factor']
    assert half['image'].shape == base['image'].shape   # same canvas bucket


def test_tta_inference_merges_variants(tta_setup):
    cfg, model, variables, ds = tta_setup
    results = run_inference_tta(
        model, variables, cfg, ds,
        scales=[cfg.val_data.img_scale,
                (TINY_CANVAS[1] // 2, TINY_CANVAS[0] // 2)],
        flip=True, verbose=False)
    assert set(results) == {r.img_id for r in ds.records}
    for dets, labels, kpts in results.values():
        assert dets.shape[1] == 5 and np.isfinite(dets).all()
        assert (labels >= 0).all() and (labels < 13).all()
        # TTA is boxes-only: keypoints zeroed
        assert kpts.shape[1] == cfg.head.num_keypts * 3
        if len(kpts):
            assert np.abs(kpts).max() == 0
    # results flow through the standard evaluator
    stats, _ = evaluate_results(results, ds, iou_types=('bbox',),
                                verbose=False)
    assert np.isfinite(stats['bbox']['AP'])


def test_tta_scale_beyond_canvas_buckets(tta_setup):
    """--aug-scales larger than every configured canvas: prepare_test falls
    back to a scale-derived /size_divisor canvas shared by the aspect group
    (so batch>1 collates), and run_inference_tta lazily builds the predict
    fn for the unseen canvas (regression: KeyError at fns[canvas])."""
    cfg, model, variables, ds = tta_setup
    big = (TINY_CANVAS[1] * 2, TINY_CANVAS[0] * 2)   # exceeds all buckets
    sample = TTAVariant(ds, img_scale=big).prepare_test(0)
    ch, cw = sample['image'].shape[:2]
    assert ch > TINY_CANVAS[0] or cw > TINY_CANVAS[1]
    assert ch % cfg.val_data.size_divisor == 0
    assert cw % cfg.val_data.size_divisor == 0
    # every image in the (landscape) group shares the fallback canvas
    for i in range(1, len(ds)):
        s2 = TTAVariant(ds, img_scale=big).prepare_test(i)
        assert s2['image'].shape == sample['image'].shape
    results = run_inference_tta(model, variables, cfg, ds,
                                scales=[big], flip=False, verbose=False)
    assert set(results) == {r.img_id for r in ds.records}


def test_run_eval_tta_flag(tta_setup, tmp_path):
    cfg, model, variables, ds = tta_setup
    stats, files = run_eval(model, variables, cfg, ds,
                            out_prefix=str(tmp_path / 'tta'),
                            verbose=False, tta=True)
    assert 'bbox' in stats and 'keypoints' not in stats


def test_detector_aug_call_merges_before_nms(tta_setup):
    from kgdet_tpu.api import Detector
    cfg, model, variables, ds = tta_setup
    det = Detector(cfg, variables)
    img = (np.random.RandomState(0).rand(60, 90, 3) * 255).astype(np.uint8)
    boxes, labels = det.aug_call(
        img, scales=[cfg.val_data.img_scale], flip=True, score_thr=0.0)
    assert boxes.ndim == 2 and boxes.shape[1] == 5
    assert np.isfinite(boxes).all()
    assert len(boxes) <= cfg.test.max_per_img
