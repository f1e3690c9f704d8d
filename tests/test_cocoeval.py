"""Evaluator correctness: perfect predictions score AP=1, noise degrades it."""
import numpy as np
import pytest

from kgdet_tpu.eval.coco import CocoIndex
from kgdet_tpu.eval.cocoeval import CocoEvaluator, bbox_iou_xywh, compute_oks
from kgdet_tpu.data.deepfashion2_meta import OKS_SIGMAS, NUM_KEYPOINTS


def test_bbox_iou_basic():
    d = [[0, 0, 10, 10]]
    g = [[0, 0, 10, 10], [5, 5, 10, 10], [20, 20, 5, 5]]
    iou = bbox_iou_xywh(d, g, [0, 0, 0])
    assert iou.shape == (1, 3)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0)
    np.testing.assert_allclose(iou[0, 2], 0.0)


def test_oks_perfect_and_far():
    k = NUM_KEYPOINTS
    kps = np.zeros(k * 3)
    kps[0::3] = np.linspace(10, 50, k)
    kps[1::3] = np.linspace(10, 50, k)
    kps[2::3] = 2  # visible
    gt = {'keypoints': kps.tolist(), 'bbox': [0, 0, 60, 60], 'area': 3600.0}
    dt_same = {'keypoints': kps.tolist(), 'score': 1.0}
    far = kps.copy()
    far[0::3] += 1000
    dt_far = {'keypoints': far.tolist(), 'score': 1.0}
    oks = compute_oks([dt_same, dt_far], [gt], OKS_SIGMAS)
    np.testing.assert_allclose(oks[0, 0], 1.0)
    assert oks[1, 0] < 1e-6


def _gt_to_results(gt, jitter=0.0, seed=0):
    rng = np.random.RandomState(seed)
    bbox_res, kpt_res = [], []
    for ann in gt.dataset['annotations']:
        x, y, w, h = ann['bbox']
        dx, dy = jitter * w * rng.randn(2)[0], jitter * h * rng.randn(2)[1]
        bbox_res.append({
            'image_id': ann['image_id'],
            'category_id': ann['category_id'],
            'bbox': [x + dx, y + dy, w, h],
            'score': float(rng.uniform(0.5, 1.0)),
        })
        kps = np.array(ann['keypoints'], dtype=np.float64)
        kps[0::3] += jitter * w * rng.randn(len(kps) // 3)
        kps[1::3] += jitter * h * rng.randn(len(kps) // 3)
        kpt_res.append({
            'image_id': ann['image_id'],
            'category_id': ann['category_id'],
            'keypoints': kps.tolist(),
            'score': bbox_res[-1]['score'],
        })
    return bbox_res, kpt_res


@pytest.mark.parametrize('iou_type', ['bbox', 'keypoints'])
def test_perfect_predictions_ap1(demo_ann_file, iou_type):
    gt = CocoIndex(demo_ann_file)
    bbox_res, kpt_res = _gt_to_results(gt)
    res = bbox_res if iou_type == 'bbox' else kpt_res
    dt = gt.load_results(res)
    ev = CocoEvaluator(gt, dt, iou_type)
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert stats['AP'] == pytest.approx(1.0, abs=1e-6), stats


def test_jittered_predictions_degrade(demo_ann_file):
    gt = CocoIndex(demo_ann_file)
    bbox_res, _ = _gt_to_results(gt, jitter=0.08)
    dt = gt.load_results(bbox_res)
    ev = CocoEvaluator(gt, dt, 'bbox')
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert 0.1 < stats['AP'] < 1.0
    assert stats['AP50'] >= stats['AP']


def test_segm_eval_perfect_predictions():
    """segm iou_type scores AP=1 on echo-back polygon predictions."""
    gt_data = {
        'images': [{'id': 1, 'width': 64, 'height': 48},
                   {'id': 2, 'width': 64, 'height': 48}],
        'categories': [{'id': 1, 'name': 'a'}, {'id': 2, 'name': 'b'}],
        'annotations': [
            {'id': 1, 'image_id': 1, 'category_id': 1,
             'bbox': [5, 5, 20, 15], 'area': 300.0, 'iscrowd': 0,
             'segmentation': [[5, 5, 25, 5, 25, 20, 5, 20]]},
            {'id': 2, 'image_id': 2, 'category_id': 2,
             'bbox': [10, 10, 30, 20], 'area': 600.0, 'iscrowd': 0,
             'segmentation': [[10, 10, 40, 10, 40, 30, 10, 30]]},
        ],
    }
    gt = CocoIndex(gt_data)
    res = [{'image_id': a['image_id'], 'category_id': a['category_id'],
            'segmentation': a['segmentation'], 'bbox': a['bbox'],
            'score': 0.9, 'area': a['area']}
           for a in gt_data['annotations']]
    dt = gt.load_results(res)
    ev = CocoEvaluator(gt, dt, 'segm')
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert stats['AP'] == pytest.approx(1.0, abs=1e-6), stats

    # shifted masks must degrade AP at high IoU thresholds
    res_bad = [dict(r, segmentation=[[c + (6 if i % 2 == 0 else 0)
                                      for i, c in enumerate(r['segmentation'][0])]])
               for r in res]
    dt2 = gt.load_results(res_bad)
    ev2 = CocoEvaluator(gt, dt2, 'segm')
    ev2.evaluate()
    ev2.accumulate()
    s2 = ev2.summarize(verbose=False)
    assert s2['AP'] < stats['AP']
