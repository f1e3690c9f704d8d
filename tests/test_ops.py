"""Golden tests: Pallas/XLA ops vs NumPy references."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kgdet_tpu.ops.deform import bilinear_gather, deform_sample, deform_conv
from kgdet_tpu.ops.nms import greedy_nms, multiclass_nms_kp, NEG_INF
from kgdet_tpu.ops.points import grid_points, points2bbox, offsets_to_coords
from kgdet_tpu.ops.losses import sigmoid_focal_loss, smooth_l1_loss


# ------------------------------------------------------------------ bilinear
def np_bilinear(feat, pos):
    """NumPy oracle mirroring the CUDA deformable_im2col_bilinear rules."""
    B, H, W, C = feat.shape
    _, P, K, _ = pos.shape
    out = np.zeros((B, P, K, C), feat.dtype)
    for b in range(B):
        for p in range(P):
            for k in range(K):
                y, x = pos[b, p, k]
                if y <= -1 or y >= H or x <= -1 or x >= W:
                    continue
                y0, x0 = int(np.floor(y)), int(np.floor(x))
                dy, dx = y - y0, x - x0
                for cy, cx, w in ((y0, x0, (1 - dy) * (1 - dx)),
                                  (y0, x0 + 1, (1 - dy) * dx),
                                  (y0 + 1, x0, dy * (1 - dx)),
                                  (y0 + 1, x0 + 1, dy * dx)):
                    if 0 <= cy < H and 0 <= cx < W:
                        out[b, p, k] += w * feat[b, cy, cx]
    return out


def test_bilinear_gather_matches_numpy():
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 6, 7, 5).astype(np.float32)
    pos = rng.uniform(-2, 8, size=(2, 11, 3, 2)).astype(np.float32)
    got = np.asarray(bilinear_gather(jnp.asarray(feat), jnp.asarray(pos)))
    want = np_bilinear(feat, pos)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_deform_conv_zero_offsets_equals_conv():
    """With tap offsets = the static 3x3 grid, DCN == plain 3x3 conv."""
    rng = np.random.RandomState(1)
    B, H, W, C, Cout = 1, 8, 9, 4, 6
    feat = rng.randn(B, H, W, C).astype(np.float32)
    w = rng.randn(9, C, Cout).astype(np.float32) * 0.1
    base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing='ij'),
                    axis=-1).reshape(9, 2).astype(np.float32)
    offs = np.broadcast_to(base, (B, H, W, 9, 2))
    got = np.asarray(deform_conv(jnp.asarray(feat), jnp.asarray(offs),
                                 jnp.asarray(w)))
    # plain conv with zero padding
    want = jax.lax.conv_general_dilated(
        jnp.asarray(feat), jnp.asarray(w.reshape(3, 3, C, Cout)),
        window_strides=(1, 1), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)


def test_deform_grad_finite_differences():
    jax.config.update('jax_enable_x64', True)
    try:
        rng = np.random.RandomState(2)
        feat = jnp.asarray(rng.randn(1, 5, 5, 3))
        offs = jnp.asarray(rng.uniform(-1, 1, (1, 5, 5, 2, 2))
                           + 0.3)  # keep away from integer positions

        def f(o):
            return jnp.sum(deform_sample(feat, o) ** 2)

        g = jax.grad(f)(offs)
        eps = 1e-6
        i = (0, 3, 2, 1, 0)
        fd = (f(offs.at[i].add(eps)) - f(offs.at[i].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4)
    finally:
        jax.config.update('jax_enable_x64', False)


# ----------------------------------------------------------------------- nms
def np_greedy_nms(boxes, scores, thr, offset=1.0):
    order = np.argsort(-scores)
    keep = []
    sup = np.zeros(len(scores), bool)
    for i in order:
        if sup[i] or scores[i] <= NEG_INF / 2:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        iw = np.clip(x2 - x1 + offset, 0, None)
        ih = np.clip(y2 - y1 + offset, 0, None)
        inter = iw * ih
        a = (boxes[i, 2] - boxes[i, 0] + offset) * (boxes[i, 3] - boxes[i, 1] + offset)
        b = (boxes[:, 2] - boxes[:, 0] + offset) * (boxes[:, 3] - boxes[:, 1] + offset)
        iou = inter / (a + b - inter)
        sup |= iou > thr
    return keep


def test_greedy_nms_matches_numpy():
    rng = np.random.RandomState(3)
    N = 60
    ctr = rng.uniform(20, 80, (N, 2))
    wh = rng.uniform(5, 30, (N, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, N).astype(np.float32)
    keep_idx, keep_scores = greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, N)
    got = [int(i) for i, s in zip(keep_idx, keep_scores) if s > NEG_INF / 2]
    want = np_greedy_nms(boxes, scores, 0.5)
    assert got == want


def test_multiclass_nms_kp_shapes_and_threshold():
    rng = np.random.RandomState(4)
    N, C, K3 = 40, 13, 294 * 3
    boxes = np.sort(rng.uniform(0, 100, (N, 2, 2)), axis=1).transpose(
        0, 2, 1).reshape(N, 4).astype(np.float32)
    scores = rng.uniform(0, 0.04, (N, C)).astype(np.float32)  # all below thr
    scores[3, 5] = 0.9
    scores[7, 5] = 0.8
    kpts = rng.randn(N, K3).astype(np.float32)
    det, labels, k, valid = multiclass_nms_kp(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(kpts),
        score_thr=0.05, iou_thr=0.5, max_per_class=10, max_per_img=100)
    assert det.shape == (100, 5) and k.shape == (100, K3)
    nvalid = int(np.sum(np.asarray(valid)))
    assert 1 <= nvalid <= 2  # box 7 may be suppressed by box 3
    assert np.asarray(labels)[0] == 5
    np.testing.assert_allclose(np.asarray(det)[0, 4], 0.9)


# -------------------------------------------------------------------- points
def test_grid_points():
    pts = np.asarray(grid_points(2, 3, 16))
    assert pts.shape == (6, 3)
    np.testing.assert_allclose(pts[4], [16, 16, 16])  # row 1, col 1


def test_points2bbox_moment_matches_reference_math():
    rng = np.random.RandomState(5)
    pts = rng.randn(4, 83 * 2).astype(np.float32)
    mt = jnp.asarray([0.1, -0.2])
    got = np.asarray(points2bbox(jnp.asarray(pts), 'moment', mt))
    p = pts.reshape(4, 83, 2)
    y, x = p[..., 0], p[..., 1]
    # torch.std is the unbiased (n-1) estimator
    sx = x.std(-1, ddof=1) * np.exp(0.1)
    sy = y.std(-1, ddof=1) * np.exp(-0.2)
    want = np.stack([x.mean(-1) - sx, y.mean(-1) - sy,
                     x.mean(-1) + sx, y.mean(-1) + sy], -1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_offsets_to_coords():
    centers = np.asarray(grid_points(2, 2, 32))[:, :2]
    offs = np.zeros((1, 4, 4), np.float32)  # 2 points, y_first pairs
    offs[0, :, 0] = 1.0  # dy of first point = 1 (stride units)
    out = np.asarray(offsets_to_coords(
        jnp.asarray(offs), jnp.asarray(centers), 32))
    # first pair decodes to (x=cx, y=cy+32)
    np.testing.assert_allclose(out[0, 3, :2], [32, 32 + 32])


# -------------------------------------------------------------------- losses
def test_focal_loss_matches_manual():
    rng = np.random.RandomState(6)
    logits = rng.randn(8, 13).astype(np.float32)
    labels = np.array([0, 1, 13, 0, 5, 0, 2, 7])
    w = np.ones(8, np.float32)
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(w), avg_factor=4.0))
    t = np.zeros((8, 13), np.float32)
    for i, l in enumerate(labels):
        if l > 0:
            t[i, l - 1] = 1
    p = 1 / (1 + np.exp(-logits))
    pt = (1 - p) * t + p * (1 - t)
    fw = (0.25 * t + 0.75 * (1 - t)) * pt ** 2
    bce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    want = (bce * fw).sum() / 4.0
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_smooth_l1():
    pred = jnp.asarray([0.0, 2.0, 3.0])
    tgt = jnp.asarray([1.0, 1.0, 1.0])
    w = jnp.asarray([1.0, 0.0, 1.0])
    got = float(smooth_l1_loss(pred, tgt, w, beta=1.0, avg_factor=2.0))
    # |d|=1 -> 0.5; |d|=2 -> 1.5 ; weights kill the middle
    np.testing.assert_allclose(got, (0.5 + 1.5) / 2.0)


def test_extra_losses_finite_and_sane():
    from kgdet_tpu.ops.losses import (
        balanced_l1_loss, cross_entropy_loss, ghm_c_loss, giou_loss,
        iou_loss)
    rng = np.random.RandomState(0)
    corners = np.sort(rng.uniform(0, 50, (6, 2, 2)), axis=1)
    pred = jnp.asarray(np.concatenate(
        [corners[:, 0], corners[:, 1]], axis=1))  # (x1, y1, x2, y2)
    # iou/giou of identical boxes = 0 loss
    assert float(iou_loss(pred, pred)) < 1e-5
    assert float(giou_loss(pred, pred)) < 1e-5
    shifted = pred + 5.0
    assert float(iou_loss(pred, shifted)) > 0.1
    assert float(giou_loss(pred, shifted)) > 0.1
    # balanced L1 at 0 diff = 0, monotone
    z = jnp.zeros((4,))
    assert float(balanced_l1_loss(z, z)) == 0.0
    assert float(balanced_l1_loss(z + 2, z)) > float(
        balanced_l1_loss(z + 1, z))
    # CE picks the right class
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    assert float(cross_entropy_loss(
        logits, jnp.asarray([0, 1]))) < 1e-3
    # GHM finite
    g = float(ghm_c_loss(jnp.asarray(rng.randn(8, 13), jnp.float32),
                         jnp.asarray([0, 1, 3, 0, 5, 13, 2, 0]),
                         jnp.ones(8)))
    assert np.isfinite(g) and g > 0


def test_conv_ws_normalizes_kernel():
    from kgdet_tpu.models.layers import ConvWS
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    m = ConvWS(features=8, kernel_size=3)
    v = m.init(jax.random.PRNGKey(0), x)
    # scale the kernel: weight standardization makes the output invariant
    v2 = {'params': {'kernel': v['params']['kernel'] * 7.0 + 0.0,
                     'bias': v['params']['bias']}}
    y1 = m.apply(v, x)
    y2 = m.apply(v2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-3)


def test_modulated_deform_conv():
    rng = np.random.RandomState(1)
    B, H, W, C, Cout = 1, 6, 6, 4, 5
    feat = rng.randn(B, H, W, C).astype(np.float32)
    w = rng.randn(9, C, Cout).astype(np.float32) * 0.1
    base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing='ij'),
                    axis=-1).reshape(9, 2).astype(np.float32)
    offs = np.broadcast_to(base, (B, H, W, 9, 2))
    # modulation 0 -> zero output; modulation 1 -> plain DCN
    mod0 = jnp.zeros((B, H, W, 9))
    mod1 = jnp.ones((B, H, W, 9))
    out0 = deform_conv(jnp.asarray(feat), jnp.asarray(offs), jnp.asarray(w),
                       modulation=mod0)
    out1 = deform_conv(jnp.asarray(feat), jnp.asarray(offs), jnp.asarray(w),
                       modulation=mod1)
    plain = deform_conv(jnp.asarray(feat), jnp.asarray(offs), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out0), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(plain),
                               atol=1e-5)
