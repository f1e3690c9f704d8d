"""Assignment & target-building semantics vs a NumPy reference loop."""
import numpy as np
import jax.numpy as jnp

from kgdet_tpu.core.targets import assign_points_single, point_targets, INF
from kgdet_tpu.ops.points import grid_points


def np_point_assigner(points, valid, gts, gt_mask, scale, pos_num):
    """Direct transcription of the sequential reference algorithm."""
    pts = points[valid]
    idx_map = np.where(valid)[0]
    pts_lvl = np.log2(pts[:, 2]).astype(int)
    lvl_min, lvl_max = pts_lvl.min(), pts_lvl.max()
    assigned = np.zeros(len(pts), dtype=int)  # 1-based
    best = np.full(len(pts), np.inf)
    for g in range(len(gts)):
        if not gt_mask[g]:
            continue
        x1, y1, x2, y2 = gts[g]
        cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
        w, h = max(x2 - x1, 1e-6), max(y2 - y1, 1e-6)
        lvl = int(np.trunc((np.log2(w / scale) + np.log2(h / scale)) / 2))
        lvl = np.clip(lvl, lvl_min, lvl_max)
        sel = pts_lvl == lvl
        sel_idx = np.where(sel)[0]
        d = np.linalg.norm((pts[sel, :2] - [cx, cy]) / [w, h], axis=1)
        k = min(pos_num, len(d))
        order = np.argsort(d, kind='stable')[:k]
        for o in order:
            pi = sel_idx[o]
            if d[o] < best[pi]:
                assigned[pi] = g + 1
                best[pi] = d[o]
    full = np.zeros(len(points), dtype=int)
    full[idx_map] = assigned
    return full


def test_assigner_matches_reference_loop():
    rng = np.random.RandomState(0)
    pts = np.asarray(grid_points(8, 10, 32))  # single level, stride 32
    valid = np.ones(80, bool)
    valid[-15:] = False
    G = 6
    ctr = rng.uniform(40, 260, (G, 2))
    wh = rng.uniform(60, 220, (G, 2))
    gts = np.concatenate([ctr - wh / 2, ctr + wh / 2], -1).astype(np.float32)
    mask = np.array([True] * 4 + [False] * 2)

    want = np_point_assigner(pts, valid, gts, mask, scale=4, pos_num=9)
    got_idx, got_pos = assign_points_single(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(gts),
        jnp.asarray(mask), scale=4, pos_num=9)
    got = np.where(np.asarray(got_pos), np.asarray(got_idx) + 1, 0)
    np.testing.assert_array_equal(got, want)


def test_point_targets_shapes_and_weights():
    pts = grid_points(4, 4, 32)
    B, G, K = 2, 3, 5
    valid = jnp.ones((B, 16), bool)
    gts = jnp.asarray(np.array([
        [[10, 10, 100, 100], [0, 0, 0, 0], [30, 30, 90, 110]],
        [[5, 5, 120, 60], [0, 0, 0, 0], [0, 0, 0, 0]],
    ], np.float32))
    labels = jnp.asarray([[3, 0, 7], [1, 0, 0]])
    kpts = jnp.asarray(np.random.RandomState(1).uniform(
        0, 100, (B, G, K, 3)).astype(np.float32))
    kpts = kpts.at[..., 2].set(
        (np.random.RandomState(2).rand(B, G, K) > 0.3).astype(np.float32))
    mask = jnp.asarray([[True, False, True], [True, False, False]])

    t = point_targets(pts, valid, gts, labels, kpts, mask, pos_num=4)
    assert t.labels.shape == (B, 16)
    assert t.kpt_gt.shape == (B, 16, K * 2)
    # positives carry their gt label
    pos = np.asarray(t.labels) > 0
    assert pos.any()
    # weights: interleaved duplicated visibilities on positive points only
    kw = np.asarray(t.kpt_weights)
    np.testing.assert_array_equal(kw[..., 0::2], kw[..., 1::2])
    assert (kw[~pos] == 0).all()
    # num_pos >= 1 always
    assert (np.asarray(t.num_pos) >= 1).all()


def test_invalid_points_never_assigned():
    pts = grid_points(4, 4, 32)
    valid = jnp.zeros((16,), bool)
    gts = jnp.asarray([[10., 10., 120., 120.]])
    idx, pos = assign_points_single(pts, valid, gts,
                                    jnp.asarray([True]), 4, 25)
    assert not bool(np.asarray(pos).any())
