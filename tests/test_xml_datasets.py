"""VOC/XML + WIDER Face datasets and the VOC mean-AP evaluation path."""
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from kgdet_tpu.config import DataConfig
from kgdet_tpu.data.loader import DataLoader
from kgdet_tpu.data.xml_dataset import (
    VOC_CLASSES, VOCDataset, WIDERFaceDataset)
from kgdet_tpu.eval.mean_ap import eval_voc_results


def _write_xml(path, w, h, objects, folder=None):
    root = ET.Element('annotation')
    if folder:
        ET.SubElement(root, 'folder').text = folder
    size = ET.SubElement(root, 'size')
    ET.SubElement(size, 'width').text = str(w)
    ET.SubElement(size, 'height').text = str(h)
    for name, box, difficult in objects:
        obj = ET.SubElement(root, 'object')
        ET.SubElement(obj, 'name').text = name
        ET.SubElement(obj, 'difficult').text = str(difficult)
        bb = ET.SubElement(obj, 'bndbox')
        for tag, v in zip(('xmin', 'ymin', 'xmax', 'ymax'), box):
            ET.SubElement(bb, tag).text = str(v)
    ET.ElementTree(root).write(path)


def make_voc_tree(tmpdir, n_images=4):
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(tmpdir, 'Annotations'))
    os.makedirs(os.path.join(tmpdir, 'JPEGImages'))
    ids = []
    for i in range(n_images):
        img_id = f'{i:06d}'
        ids.append(img_id)
        w, h = 160, 120
        cv2.imwrite(os.path.join(tmpdir, 'JPEGImages', f'{img_id}.jpg'),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
        objects = [('dog', (10, 10, 60, 60), 0),
                   ('person', (80, 20, 140, 100), 0),
                   ('car', (5, 80, 40, 110), 1)]     # difficult -> ignore
        _write_xml(os.path.join(tmpdir, 'Annotations', f'{img_id}.xml'),
                   w, h, objects)
    ann_file = os.path.join(tmpdir, 'trainval.txt')
    with open(ann_file, 'w') as f:
        f.write('\n'.join(ids))
    return ann_file


@pytest.fixture(scope='module')
def voc_ds(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp('voc'))
    ann_file = make_voc_tree(tmpdir)
    cfg = DataConfig(ann_file=ann_file, img_prefix=tmpdir,
                     img_scale=(160, 120), max_gts=8, max_ignore=4,
                     flip_ratio=0.5, batch_size=2,
                     canvas_hw=((128, 160),))
    return VOCDataset(cfg, train=True)


def test_voc_parse_and_prepare(voc_ds):
    b, l, k, ignore = voc_ds.parse_annotations('000000')
    assert len(b) == 2 and len(ignore) == 1
    assert l.tolist() == [VOC_CLASSES.index('dog') + 1,
                          VOC_CLASSES.index('person') + 1]
    np.testing.assert_allclose(b[0], [9, 9, 59, 59])   # VOC -1 convention
    assert k.shape == (2, 1, 3)

    s = voc_ds.prepare_train(0, np.random.RandomState(3))
    assert s['image'].shape == (128, 160, 3)
    assert s['gt_mask'].sum() == 2
    assert s['gt_ignore_mask'].sum() == 1
    assert s['gt_kpts'].shape == (8, 1, 3)

    batch = next(iter(DataLoader(voc_ds, 2, train=True, num_workers=0)))
    assert batch['gt_bboxes'].shape == (2, 8, 4)


def test_voc_eval_perfect_detections(voc_ds):
    results = {}
    for rec in voc_ds.records:
        b, l, _, _ = voc_ds.parse_annotations(rec.img_id)
        dets = np.concatenate(
            [b, np.full((len(b), 1), 0.9, np.float32)], axis=1)
        results[rec.img_id] = (dets, l - 1, np.zeros((len(b), 3)))
    mean_ap, per_class = eval_voc_results(results, voc_ds, iou_thr=0.5)
    assert mean_ap == pytest.approx(1.0)
    mean_ap07, _ = eval_voc_results(results, voc_ds, mode='11points')
    assert mean_ap07 == pytest.approx(1.0, abs=0.1)


def test_widerface_folder_layout(tmp_path):
    tmpdir = str(tmp_path)
    os.makedirs(os.path.join(tmpdir, 'Annotations'))
    os.makedirs(os.path.join(tmpdir, '0--Parade'))
    cv2.imwrite(os.path.join(tmpdir, '0--Parade', 'img1.jpg'),
                np.zeros((100, 150, 3), np.uint8))
    _write_xml(os.path.join(tmpdir, 'Annotations', 'img1.xml'),
               150, 100, [('face', (10, 10, 50, 50), 0)],
               folder='0--Parade')
    ann_file = os.path.join(tmpdir, 'val.txt')
    with open(ann_file, 'w') as f:
        f.write('img1\n')
    cfg = DataConfig(ann_file=ann_file, img_prefix=tmpdir,
                     img_scale=(160, 120), max_gts=4,
                     canvas_hw=((128, 160),))
    ds = WIDERFaceDataset(cfg, train=False)
    assert ds.records[0].filename == os.path.join('0--Parade', 'img1.jpg')
    s = ds.prepare_test(0)
    assert np.isfinite(s['image']).all()


def test_min_size_moves_small_boxes_to_ignore(tmp_path):
    tmpdir = str(tmp_path)
    os.makedirs(os.path.join(tmpdir, 'Annotations'))
    os.makedirs(os.path.join(tmpdir, 'JPEGImages'))
    cv2.imwrite(os.path.join(tmpdir, 'JPEGImages', 'a.jpg'),
                np.zeros((100, 100, 3), np.uint8))
    _write_xml(os.path.join(tmpdir, 'Annotations', 'a.xml'), 100, 100,
               [('dog', (10, 10, 15, 15), 0),     # tiny -> ignore
                ('dog', (20, 20, 80, 80), 0)])
    ann_file = os.path.join(tmpdir, 'train.txt')
    open(ann_file, 'w').write('a\n')
    cfg = DataConfig(ann_file=ann_file, img_prefix=tmpdir,
                     img_scale=(100, 100), canvas_hw=((96, 96),))
    ds = VOCDataset(cfg, train=True, min_size=10)
    b, l, _, ignore = ds.parse_annotations('a')
    assert len(b) == 1 and len(ignore) == 1


def test_coco_variant_datasets(tmp_path):
    """Cityscapes (no kpts) + DeepFashion-3class (8 kpts, flip pairs)."""
    import json
    from kgdet_tpu.data.coco_variants import (
        CityscapesDataset, DeepFashionDataset)

    tmpdir = str(tmp_path)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (100, 150, 3), np.uint8)
    cv2.imwrite(os.path.join(tmpdir, 'i.jpg'), img)
    kpts = np.zeros((8, 3), np.float32)
    kpts[:, 0] = np.arange(8) * 10 + 20
    kpts[:, 1] = 30
    kpts[:, 2] = 2
    data = {
        'images': [{'id': 1, 'file_name': 'i.jpg',
                    'width': 150, 'height': 100}],
        'annotations': [{'id': 1, 'image_id': 1, 'category_id': 1,
                         'bbox': [10.0, 10.0, 80.0, 60.0], 'area': 4800.0,
                         'iscrowd': 0,
                         'keypoints': kpts.reshape(-1).tolist()}],
        'categories': [{'id': c, 'name': f'c{c}'} for c in (1, 2, 3)],
    }
    ann = os.path.join(tmpdir, 'ann.json')
    json.dump(data, open(ann, 'w'))
    cfg = DataConfig(ann_file=ann, img_prefix=tmpdir, img_scale=(150, 100),
                     max_gts=4, flip_ratio=1.0, canvas_hw=((96, 160),))

    cs = CityscapesDataset(cfg, train=True)
    s = cs.prepare_train(0, np.random.RandomState(0))
    assert s['gt_kpts'].shape == (4, 1, 3)
    assert cs.class_names[0] == 'person'

    df = DeepFashionDataset(cfg, train=True)
    s = df.prepare_train(0, np.random.RandomState(0))
    assert s['gt_kpts'].shape == (4, 8, 3)
    # flip_ratio=1: class-1 pairs (0,1),(2,3),(6,7) swapped, (4,5) not
    k = s['gt_kpts'][0]
    sf = s['gt_bboxes'][0][2] / 89.0    # resized scale via box x2
    xs_orig = kpts[:, 0]
    rw = s['valid_hw'][1]
    flipped_x = rw - xs_orig * (rw / 150.0) - 1
    np.testing.assert_allclose(k[0, 0], flipped_x[1], atol=1.5)
    np.testing.assert_allclose(k[4, 0], flipped_x[4], atol=1.5)
