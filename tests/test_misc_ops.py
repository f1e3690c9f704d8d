"""masked_conv2d / deform_roi_pooling checks."""
import numpy as np
import jax
import jax.numpy as jnp

from kgdet_tpu.ops.misc_ops import deform_roi_pooling, masked_conv2d
from kgdet_tpu.ops.roi import roi_align


def test_masked_conv_zeroes_unmasked():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 5).astype(np.float32))
    mask = np.zeros((1, 8, 8), np.float32)
    mask[0, 2:5, 2:5] = 1
    y = masked_conv2d(x, jnp.asarray(mask), w)
    dense = jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(np.asarray(y[0, 3, 3]),
                               np.asarray(dense[0, 3, 3]), atol=1e-5)
    assert np.all(np.asarray(y[0, 0, 0]) == 0)


def test_deform_roi_pooling_zero_offsets_equals_roi_align():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(2, 12, 14, 4).astype(np.float32))
    rois = jnp.asarray([[0, 2.0, 3.0, 10.0, 9.0],
                        [1, 1.0, 1.0, 12.0, 10.0]], jnp.float32)
    offs = jnp.zeros((2, 3, 3, 2))
    got = deform_roi_pooling(feat, rois, offs, out_size=3)
    want = roi_align(feat, rois, out_size=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # nonzero offsets change the result; modulation scales it
    offs2 = offs.at[..., 0].set(0.5)
    got2 = deform_roi_pooling(feat, rois, offs2, out_size=3)
    assert np.abs(np.asarray(got2) - np.asarray(got)).max() > 1e-3
    mod = jnp.full((2, 3, 3), 0.5)
    got3 = deform_roi_pooling(feat, rois, offs, out_size=3, modulation=mod)
    np.testing.assert_allclose(np.asarray(got3), 0.5 * np.asarray(got),
                               atol=1e-6)
