"""Corruption transforms: shape/dtype preservation, severity monotonicity."""
import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from kgdet_tpu.data.corruptions import CORRUPTIONS, corrupt


@pytest.fixture(scope='module')
def img():
    rng = np.random.RandomState(0)
    base = np.zeros((64, 80, 3), np.uint8)
    base[16:48, 20:60] = [180, 120, 60]
    return (base + rng.randint(0, 40, base.shape)).astype(np.uint8)


@pytest.mark.parametrize('name', sorted(CORRUPTIONS))
def test_shape_dtype_and_effect(img, name):
    out = corrupt(img, name, 3)
    assert out.shape == img.shape
    assert out.dtype == np.uint8
    assert np.abs(out.astype(int) - img.astype(int)).mean() > 0.1


def test_severity_increases_distortion(img):
    for name in ('gaussian_noise', 'pixelate', 'contrast'):
        d1 = np.abs(corrupt(img, name, 1).astype(int) - img.astype(int)).mean()
        d5 = np.abs(corrupt(img, name, 5).astype(int) - img.astype(int)).mean()
        assert d5 > d1, name


def test_invalid_args(img):
    with pytest.raises(KeyError):
        corrupt(img, 'nope', 1)
    with pytest.raises(ValueError):
        corrupt(img, 'gaussian_noise', 9)


def test_deterministic(img):
    a = corrupt(img, 'gaussian_noise', 3)
    b = corrupt(img, 'gaussian_noise', 3)
    np.testing.assert_array_equal(a, b)
