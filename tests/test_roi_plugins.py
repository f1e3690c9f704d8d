"""RoIAlign/RoIPool vs NumPy oracles; plugin blocks smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.ops.roi import roi_align, roi_pool


def np_roi_align(feat, rois, out_size, scale, s):
    """Oracle mirroring roi_align_kernel.cu's sampling positions."""
    B, H, W, C = feat.shape
    R = len(rois)
    out = np.zeros((R, out_size, out_size, C), np.float64)
    for r, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = np.asarray(roi[1:]) * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / out_size, rh / out_size
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(C)
                for iy in range(s):
                    for ix in range(s):
                        y = y1 + (ph + (iy + 0.5) / s) * bh
                        x = x1 + (pw + (ix + 0.5) / s) * bw
                        acc += np_bilinear_point(feat[b], y, x)
                out[r, ph, pw] = acc / (s * s)
    return out


def np_bilinear_point(fm, y, x):
    H, W, C = fm.shape
    if y <= -1 or y >= H or x <= -1 or x >= W:
        return np.zeros(C)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    dy, dx = y - y0, x - x0
    acc = np.zeros(C)
    for cy, cx, w in ((y0, x0, (1 - dy) * (1 - dx)),
                      (y0, x0 + 1, (1 - dy) * dx),
                      (y0 + 1, x0, dy * (1 - dx)),
                      (y0 + 1, x0 + 1, dy * dx)):
        if 0 <= cy < H and 0 <= cx < W:
            acc += w * fm[cy, cx]
    return acc


def test_roi_align_matches_oracle():
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 12, 14, 5).astype(np.float32)
    rois = np.array([[0, 2.0, 3.0, 10.0, 9.0],
                     [1, 0.0, 0.0, 13.0, 11.0],
                     [0, 5.5, 1.5, 8.25, 7.75]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                               out_size=3, spatial_scale=0.5, sample_num=2))
    want = np_roi_align(feat, rois, 3, 0.5, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_differentiable():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    rois = jnp.asarray([[0, 1.0, 1.0, 6.0, 6.0]], jnp.float32)
    g = jax.grad(lambda f: jnp.sum(roi_align(f, rois, out_size=2) ** 2))(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_roi_pool_max_semantics():
    feat = np.zeros((1, 8, 8, 1), np.float32)
    feat[0, 2, 3, 0] = 5.0
    feat[0, 6, 6, 0] = 7.0
    rois = jnp.asarray([[0, 0.0, 0.0, 7.0, 7.0]], jnp.float32)
    out = np.asarray(roi_pool(jnp.asarray(feat), rois, out_size=2))
    assert out.max() == 7.0
    assert out[0, 0, 0, 0] == 5.0   # top-left bin holds the 5
    assert out[0, 1, 1, 0] == 7.0


def test_plugins_smoke():
    from kgdet_tpu.models.plugins import ContextBlock, NonLocal2D
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 7, 16).astype(np.float32))
    for mod in (ContextBlock(), ContextBlock(pooling_type='avg',
                                             fusion_types=('channel_mul',)),
                NonLocal2D()):
        variables = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(variables, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
    # zero-init output convs: NonLocal2D is an identity at init
    nl = NonLocal2D()
    v = nl.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(np.asarray(nl.apply(v, x)), np.asarray(x),
                               atol=1e-6)
