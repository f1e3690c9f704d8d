"""Data pipeline tests: transforms, dataset parsing, grouped loader."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from kgdet_tpu.config import DataConfig
from kgdet_tpu.data.dataset import DeepFashion2Dataset
from kgdet_tpu.data.deepfashion2_meta import (
    CLASS_KEYPOINT_RANGES, NUM_KEYPOINTS, global_flip_indices,
    interleaved_flip_indices)
from kgdet_tpu.data.loader import DataLoader, collate, grouped_batch_indices
from kgdet_tpu.data.transforms import (
    flip_bboxes, flip_keypoints, imnormalize, imrescale, keep_ratio_scale,
    pad_to_canvas)


# ------------------------------------------------------------- synthetic set
def make_synth_coco(tmpdir, n_images=10, seed=0, landscape_only=False):
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        # mix of landscape and portrait
        if i % 2 == 0 or landscape_only:
            w, h = 160, 120
        else:
            w, h = 120, 160
        fname = f'img_{i:03d}.jpg'
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(tmpdir, fname), img)
        images.append({'id': i + 1, 'file_name': fname,
                       'width': w, 'height': h})
        for _ in range(rng.randint(1, 4)):
            bw, bh = rng.randint(20, 60), rng.randint(20, 60)
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            cat = int(rng.randint(1, 14))
            s, e = CLASS_KEYPOINT_RANGES[cat]
            kpts = np.zeros((NUM_KEYPOINTS, 3), np.float32)
            kpts[s:e, 0] = rng.uniform(x1, x1 + bw, e - s)
            kpts[s:e, 1] = rng.uniform(y1, y1 + bh, e - s)
            kpts[s:e, 2] = rng.randint(0, 3, e - s)
            annotations.append({
                'id': ann_id, 'image_id': i + 1, 'category_id': cat,
                'bbox': [float(x1), float(y1), float(bw), float(bh)],
                'area': float(bw * bh), 'iscrowd': 0,
                'keypoints': kpts.reshape(-1).tolist(),
            })
            ann_id += 1
    categories = [{'id': c, 'name': f'cls{c}'} for c in range(1, 14)]
    ann_file = os.path.join(tmpdir, 'ann.json')
    with open(ann_file, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    return ann_file


@pytest.fixture(scope='module')
def synth_data(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp('synth_coco'))
    ann_file = make_synth_coco(tmpdir)
    return DataConfig(ann_file=ann_file, img_prefix=tmpdir,
                      img_scale=(128, 96), max_gts=8,
                      canvas_hw=((96, 128), (128, 96)))


# ---------------------------------------------------------------- transforms
def test_keep_ratio_scale_matches_mmcv_convention():
    # 1000x600 at (1333, 800): min(1333/1000, 800/600) = 1.333
    assert keep_ratio_scale(600, 1000, (1333, 800)) == pytest.approx(1.333)
    # portrait image
    assert keep_ratio_scale(1000, 600, (1333, 800)) == pytest.approx(1.333)
    # huge image scales down
    assert keep_ratio_scale(2000, 3000, (1333, 800)) == pytest.approx(
        min(1333 / 3000, 800 / 2000))


def test_imrescale_and_pad():
    img = np.zeros((100, 150, 3), np.uint8)
    resized, sf = imrescale(img, (128, 96))
    assert max(resized.shape[:2]) <= 128 and min(resized.shape[:2]) <= 96
    padded = pad_to_canvas(resized.astype(np.float32), (96, 128))
    assert padded.shape == (96, 128, 3)


def test_imnormalize_rgb_order():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 100  # blue channel (BGR input)
    out = imnormalize(img)
    # after BGR->RGB, blue is the last channel
    assert abs(out[0, 0, 2] - (100 - 140.744) / 62.076) < 1e-4
    assert abs(out[0, 0, 0] - (0 - 154.992) / 62.757) < 1e-4


def test_flip_indices_involution():
    flip = global_flip_indices()
    np.testing.assert_array_equal(flip[flip], np.arange(NUM_KEYPOINTS))
    inter = interleaved_flip_indices()
    np.testing.assert_array_equal(inter[inter], np.arange(NUM_KEYPOINTS * 2))


def test_flip_keypoints_involution():
    rng = np.random.RandomState(0)
    kpts = np.zeros((3, NUM_KEYPOINTS, 3), np.float32)
    labels = np.array([1, 5, 13])
    for i, l in enumerate(labels):
        s, e = CLASS_KEYPOINT_RANGES[l]
        kpts[i, s:e, :2] = rng.uniform(0, 99, (e - s, 2))
        kpts[i, s:e, 2] = rng.randint(1, 3, e - s)
    once = flip_keypoints(kpts, labels, 100)
    twice = flip_keypoints(once, labels, 100)
    np.testing.assert_allclose(twice, kpts, atol=1e-4)
    # visible x-coordinates mirrored
    vis = kpts[..., 2] > 0
    assert np.all(np.abs(
        (99 - kpts[..., 0][vis])
        - once[..., 0][np.where(vis)[0],
                       global_flip_indices()[np.where(vis)[1]]]) < 1e-5)


def test_flip_bboxes_involution():
    boxes = np.array([[10., 20., 50., 60.]])
    np.testing.assert_allclose(flip_bboxes(flip_bboxes(boxes, 100), 100),
                               boxes)


# ------------------------------------------------------------------- dataset
def test_dataset_parsing_and_train_sample(synth_data):
    ds = DeepFashion2Dataset(synth_data, train=True)
    assert len(ds) == 10
    assert set(np.unique(ds.flags)) == {0, 1}
    rng = np.random.RandomState(0)
    s = ds.prepare_train(0, rng)
    assert s['image'].shape in [(96, 128, 3), (128, 96, 3)]
    assert s['gt_bboxes'].shape == (8, 4)
    assert s['gt_kpts'].shape == (8, NUM_KEYPOINTS, 3)
    n = int(s['gt_mask'].sum())
    assert 1 <= n <= 8
    # boxes inside the valid region
    vh, vw = s['valid_hw']
    assert np.all(s['gt_bboxes'][:n, 2] <= vw + 1)
    assert np.all(s['gt_bboxes'][:n, 3] <= vh + 1)
    # labels 1-based
    assert np.all(s['gt_labels'][:n] >= 1)


def test_dataset_test_sample(synth_data):
    ds = DeepFashion2Dataset(synth_data, train=False)
    s = ds.prepare_test(1)
    assert s['image'].shape in [(96, 128, 3), (128, 96, 3)]
    assert s['scale_factor'] > 0
    assert s['img_id'] == ds.records[1].img_id


# -------------------------------------------------------------------- loader
def test_grouped_batches_are_homogeneous():
    flags = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 0, 1, 1])
    batches = grouped_batch_indices(flags, 4, epoch=0, seed=1)
    for b in batches:
        assert len(b) == 4
        assert len(np.unique(flags[b])) == 1
    # epoch changes the order
    b2 = grouped_batch_indices(flags, 4, epoch=1, seed=1)
    assert not all((x == y).all() for x, y in zip(batches, b2))


def test_grouped_batches_sharding():
    flags = np.zeros(16, np.int64)
    shard0 = grouped_batch_indices(flags, 2, 0, num_shards=2, shard_id=0)
    shard1 = grouped_batch_indices(flags, 2, 0, num_shards=2, shard_id=1)
    assert len(shard0) == len(shard1) == 4
    all_idx = np.concatenate(shard0 + shard1)
    assert len(set(all_idx.tolist())) == 16


def test_loader_iterates_batches(synth_data):
    ds = DeepFashion2Dataset(synth_data, train=True)
    loader = DataLoader(ds, batch_size=2, train=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        assert b['image'].shape[0] == 2
        assert b['image'].shape[1:] in [(96, 128, 3), (128, 96, 3)]
        assert b['gt_bboxes'].shape == (2, 8, 4)
    # deterministic across iterations of the same epoch
    again = list(DataLoader(ds, batch_size=2, train=True, num_workers=0))
    np.testing.assert_allclose(batches[0]['image'], again[0]['image'])


def test_loader_test_mode_covers_all(synth_data):
    ds = DeepFashion2Dataset(synth_data, train=False)
    loader = DataLoader(ds, batch_size=2, train=False, num_workers=0)
    seen = []
    for b in loader:
        seen.extend(b['img_id'].tolist())
    assert set(seen) >= {r.img_id for r in ds.records}


def test_apply_keypoint_groups():
    from kgdet_tpu.data.dataset import apply_keypoint_groups
    from kgdet_tpu.data.deepfashion2_meta import KEYPOINT_GROUPS
    kpts = np.zeros((1, NUM_KEYPOINTS, 3), np.float32)
    group = np.asarray(KEYPOINT_GROUPS[0], np.int64) - 1
    kpts[0, group[1]] = [10.0, 20.0, 2.0]   # one visible member
    out = apply_keypoint_groups(kpts)
    # whole group takes the visible member's value
    np.testing.assert_allclose(out[0, group], [[10.0, 20.0, 2.0]] * len(group))
    # untouched groups stay zero
    other = np.asarray(KEYPOINT_GROUPS[40], np.int64) - 1
    assert np.all(out[0, other] == 0)
    # input not mutated
    assert np.all(kpts[0, group[0]] == 0)


# ----------------------------------------------------- ignore + extra augs
def make_crowd_coco(tmpdir, seed=0):
    """Small set where every image carries one crowd annotation."""
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        w, h = 160, 120
        fname = f'crowd_{i:03d}.jpg'
        cv2.imwrite(os.path.join(tmpdir, fname),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        images.append({'id': i + 1, 'file_name': fname,
                       'width': w, 'height': h})
        annotations.append({
            'id': ann_id, 'image_id': i + 1, 'category_id': 1,
            'bbox': [10.0, 10.0, 40.0, 40.0], 'area': 1600.0, 'iscrowd': 0,
            'keypoints': [0.0] * (NUM_KEYPOINTS * 3)})
        ann_id += 1
        annotations.append({
            'id': ann_id, 'image_id': i + 1, 'category_id': 2,
            'bbox': [80.0, 20.0, 60.0, 60.0], 'area': 3600.0, 'iscrowd': 1})
        ann_id += 1
    categories = [{'id': c, 'name': f'cls{c}'} for c in range(1, 14)]
    ann_file = os.path.join(tmpdir, 'crowd.json')
    with open(ann_file, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': categories}, f)
    return ann_file


def test_crowd_annotations_become_ignore_regions(tmp_path):
    ann = make_crowd_coco(str(tmp_path))
    cfg = DataConfig(ann_file=ann, img_prefix=str(tmp_path),
                     img_scale=(160, 120), max_gts=4, max_ignore=4,
                     flip_ratio=0.0, canvas_hw=((128, 160),))
    ds = DeepFashion2Dataset(cfg, train=True)
    bboxes, labels, kpts, ignore = ds.parse_annotations(1)
    assert len(bboxes) == 1 and len(ignore) == 1
    np.testing.assert_allclose(ignore[0], [80, 20, 139, 79])

    s = ds.prepare_train(0, np.random.RandomState(0))
    assert s['gt_bboxes_ignore'].shape == (4, 4)
    assert s['gt_ignore_mask'].tolist() == [True, False, False, False]
    # scaled by the keep-ratio factor like the GT boxes
    sf = s['gt_bboxes'][0][2] / bboxes[0][2]
    np.testing.assert_allclose(s['gt_bboxes_ignore'][0], ignore[0] * sf,
                               rtol=1e-5)


def test_ignore_regions_exclude_candidates_from_negatives():
    import jax.numpy as jnp
    from kgdet_tpu.core.iou_assign import assign_max_iou

    cands = jnp.asarray([[0., 0., 10., 10.],      # on the GT
                         [50., 50., 60., 60.],    # inside crowd region
                         [100., 100., 110., 110.]])  # plain negative
    valid = jnp.ones((3,), bool)
    gts = jnp.asarray([[0., 0., 10., 10.]])
    gt_mask = jnp.ones((1,), bool)
    ign = jnp.asarray([[45., 45., 70., 70.]])
    ign_mask = jnp.ones((1,), bool)

    a = assign_max_iou(cands, valid, gts, gt_mask, 0.5, 0.4, 0.0,
                       gt_bboxes_ignore=ign, gt_ignore_mask=ign_mask,
                       ignore_iof_thr=0.5)
    assert bool(a.pos_mask[0]) and not bool(a.pos_mask[1])
    assert bool(a.ignore_mask[1])          # crowd: neither pos nor neg
    assert not bool(a.ignore_mask[2])      # stays a negative
    # without the threshold the crowd candidate is a plain negative
    b = assign_max_iou(cands, valid, gts, gt_mask, 0.5, 0.4, 0.0,
                       gt_bboxes_ignore=ign, gt_ignore_mask=ign_mask,
                       ignore_iof_thr=-1.0)
    assert not bool(b.ignore_mask[1])


def test_extra_augs_wired_into_prepare_train(synth_data):
    import dataclasses
    cfg = dataclasses.replace(
        synth_data, photo_metric_distortion=True, expand=True,
        random_crop=True, flip_ratio=0.5)
    ds = DeepFashion2Dataset(cfg, train=True)
    for seed in range(6):
        s = ds.prepare_train(seed % len(ds), np.random.RandomState(seed))
        canvas = s['image'].shape[:2]
        assert canvas in tuple(cfg.canvas_hw)
        m = s['gt_mask']
        assert m.any()
        b = s['gt_bboxes'][m]
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
        assert (b >= -1e-3).all()
        assert (b[:, [0, 2]] <= s['valid_hw'][1]).all()
        assert (b[:, [1, 3]] <= s['valid_hw'][0]).all()
        assert np.isfinite(s['image']).all()
