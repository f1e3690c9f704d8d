"""Dataset wrapper tests (Concat/Repeat)."""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from kgdet_tpu.config import DataConfig
from kgdet_tpu.data.dataset import DeepFashion2Dataset
from kgdet_tpu.data.wrappers import ConcatDataset, RepeatDataset
from tests.test_data import make_synth_coco


@pytest.fixture(scope='module')
def ds(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp('wrap_coco'))
    ann = make_synth_coco(tmpdir, n_images=4)
    cfg = DataConfig(ann_file=ann, img_prefix=tmpdir, img_scale=(128, 96),
                     max_gts=8, canvas_hw=((96, 128), (128, 96)))
    return DeepFashion2Dataset(cfg, train=True)


def test_repeat(ds):
    r = RepeatDataset(ds, 3)
    assert len(r) == 3 * len(ds)
    assert len(r.flags) == len(r)
    rng = np.random.RandomState(0)
    a = r.prepare_train(1, rng)
    b = r.prepare_train(1 + len(ds), np.random.RandomState(0))
    np.testing.assert_allclose(a['image'], b['image'])


def test_concat(ds):
    c = ConcatDataset([ds, ds])
    assert len(c) == 2 * len(ds)
    rng = np.random.RandomState(0)
    a = c.prepare_train(0, rng)
    b = c.prepare_train(len(ds), np.random.RandomState(0))
    np.testing.assert_allclose(a['image'], b['image'])
    s = c.prepare_test(2 * len(ds) - 1)
    assert s['img_id'] == ds.records[-1].img_id
    with pytest.raises(IndexError):
        c._locate(2 * len(ds))
