"""Pallas deformable-sampling kernel vs the XLA reference (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

import kgdet_tpu.ops.pallas_deform as pd
from kgdet_tpu.ops.deform import bilinear_gather


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run pallas_call in interpreter mode (CPU test harness)."""
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw['interpret'] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, 'pallas_call', patched)
    yield


def test_pallas_matches_xla_reference():
    rng = np.random.RandomState(0)
    B, H, W, C, K = 2, 6, 7, 128, 5
    P = 11
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-2, 9, (B, P, K, 2)).astype(np.float32))
    want = bilinear_gather(feat, pos)
    got = pd.deform_sample_pallas(feat, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_pallas_out_of_bounds_zeroing():
    rng = np.random.RandomState(1)
    B, H, W, C, K, P = 1, 5, 5, 128, 2, 3
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    # all positions fully outside the map
    pos = jnp.full((B, P, K, 2), -10.0)
    got = pd.deform_sample_pallas(feat, pos)
    np.testing.assert_array_equal(np.asarray(got), 0)


def test_pallas_padding_path():
    """P not a multiple of TP exercises the pad/slice path."""
    rng = np.random.RandomState(2)
    B, H, W, C, K = 1, 4, 4, 128, 3
    P = pd.TP + 3
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0, 3, (B, P, K, 2)).astype(np.float32))
    want = bilinear_gather(feat, pos)
    got = pd.deform_sample_pallas(feat, pos)
    assert got.shape == (B, P, K, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize('bwd', ['v1', 'v2', 'vw'])
def test_hybrid_gradient_matches_xla(monkeypatch, bwd):
    monkeypatch.setenv('KGDET_DEFORM_BWD', bwd)
    rng = np.random.RandomState(3)
    B, H, W, C, K, P = 1, 5, 6, 128, 2, 4
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(
        rng.uniform(0.3, 4.3, (B, P, K, 2)).astype(np.float32))

    def loss_h(f, p):
        return jnp.sum(pd.deform_sample_hybrid(f, p) ** 2)

    def loss_x(f, p):
        return jnp.sum(bilinear_gather(f, p) ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1))(feat, pos)
    gx = jax.grad(loss_x, argnums=(0, 1))(feat, pos)
    np.testing.assert_allclose(np.asarray(gh[0]), np.asarray(gx[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh[1]), np.asarray(gx[1]),
                               atol=1e-4)


def test_split_pallas_matches_xla():
    from kgdet_tpu.ops.pallas_deform import (
        deform_sample_split_pallas, _split_xla)
    rng = np.random.RandomState(5)
    B, H, W, C = 2, 5, 6, 128
    taps = (2, 3, 4)
    K = sum(taps)
    P = 7
    cls_f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pts_f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 6, (B, P, K, 2)).astype(np.float32))
    got = deform_sample_split_pallas(cls_f, pts_f, pos, taps)
    want = _split_xla(cls_f, pts_f, pos, taps)
    for (gc, gp), (wc, wp) in zip(got, want):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(wc), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-5)


@pytest.mark.parametrize('variant', ['v1', 'pair', 'vw'])
def test_split_pallas_variants_match_xla(monkeypatch, variant):
    """All three tap-walk variants of the split kernel == XLA. 'vw' emits
    the pixels-in-sublanes (B, n_pt, t, S, TP, LANE) layout and the
    wrapper transposes back."""
    monkeypatch.setenv('KGDET_DEFORM_FWD', variant)
    from kgdet_tpu.ops.pallas_deform import (
        deform_sample_split_pallas, _split_xla)
    rng = np.random.RandomState(11)
    B, H, W, C = 2, 5, 6, 256
    taps = (2, 3, 4)
    K = sum(taps)
    P = pd.TP + 5
    cls_f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pts_f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 6, (B, P, K, 2)).astype(np.float32))
    got = deform_sample_split_pallas(cls_f, pts_f, pos, taps)
    want = _split_xla(cls_f, pts_f, pos, taps)
    for (gc, gp), (wc, wp) in zip(got, want):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(wc), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(wp), atol=1e-5)


def test_split_gradients_match():
    from kgdet_tpu.ops.pallas_deform import deform_sample_split, _split_xla
    rng = np.random.RandomState(6)
    B, H, W, C = 1, 4, 5, 128
    taps = (2, 3)
    K = sum(taps)
    P = 3
    cls_f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pts_f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0.2, 3.2, (B, P, K, 2)).astype(np.float32))

    def loss(fn):
        def f(cf, pf, po):
            outs = fn(cf, pf, po, taps)
            return sum(jnp.sum(a ** 2) + jnp.sum(b ** 3)
                       for a, b in outs)
        return f

    gh = jax.grad(loss(deform_sample_split), argnums=(0, 1, 2))(
        cls_f, pts_f, pos)
    gx = jax.grad(loss(_split_xla), argnums=(0, 1, 2))(cls_f, pts_f, pos)
    for a, b in zip(gh, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-4)


def test_tiled_forward_matches_xla(monkeypatch):
    """Channel-sliced path (map over budget): st < S still exact."""
    monkeypatch.setattr(pd, 'FWD_SLAB_BUDGET', 5 * 6 * 128 * 4 + 64)
    monkeypatch.setattr(pd, 'BWD_SLAB_BUDGET', 5 * 6 * 128 * 8 + 64)
    rng = np.random.RandomState(7)
    B, H, W, C, K, P = 2, 5, 6, 256, 4, 9
    assert pd.slice_tiles(H * W, C // 128, 4) == 1
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 7, (B, P, K, 2)).astype(np.float32))
    want = bilinear_gather(feat, pos)
    got = pd.deform_sample_pallas(feat, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_tiled_gradient_matches_xla(monkeypatch):
    monkeypatch.setattr(pd, 'FWD_SLAB_BUDGET', 4 * 5 * 128 * 4 + 64)
    monkeypatch.setattr(pd, 'BWD_SLAB_BUDGET', 4 * 5 * 128 * 8 + 64)
    rng = np.random.RandomState(8)
    B, H, W, C, K, P = 1, 4, 5, 256, 3, pd.TP + 2
    assert pd.slice_tiles(H * W, C // 128, 4) == 1
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 5, (B, P, K, 2)).astype(np.float32))

    def loss_h(f, p):
        return jnp.sum(pd.deform_sample_hybrid(f, p) ** 2)

    def loss_x(f, p):
        return jnp.sum(bilinear_gather(f, p) ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1))(feat, pos)
    gx = jax.grad(loss_x, argnums=(0, 1))(feat, pos)
    np.testing.assert_allclose(np.asarray(gh[0]), np.asarray(gx[0]),
                               atol=1e-4)
    # slice partials sum in a different order than the XLA einsum
    np.testing.assert_allclose(np.asarray(gh[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize('bwd', ['v1', 'v2', 'vw'])
def test_bwd_boundary_positions_match_xla(monkeypatch, bwd):
    """Positions straddling/clamped at borders: both grads agree."""
    monkeypatch.setenv('KGDET_DEFORM_BWD', bwd)
    rng = np.random.RandomState(9)
    B, H, W, C, K, P = 1, 5, 5, 128, 2, 6
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(np.array(
        [[[[-0.5, 2.0], [4.5, 4.5]],
          [[-10., -10.], [2.2, -0.7]],
          [[0.0, 0.0], [4.0, 4.0]],
          [[3.9, 4.7], [-0.2, 0.1]],
          [[1.5, 6.0], [6.0, 1.5]],
          [[2.0, 2.0], [5.2, 5.2]]]], np.float32))

    def loss_h(f, p):
        return jnp.sum(pd.deform_sample_hybrid(f, p) ** 2)

    def loss_x(f, p):
        return jnp.sum(bilinear_gather(f, p) ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1))(feat, pos)
    gx = jax.grad(loss_x, argnums=(0, 1))(feat, pos)
    np.testing.assert_allclose(np.asarray(gh[0]), np.asarray(gx[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh[1]), np.asarray(gx[1]),
                               atol=1e-4)

@pytest.mark.parametrize('cap_kb', [
    10 ** 6,   # everything fits: st=2, paired gfeat (512.4K)
    500,       # paired gfeat over cap at st=2 -> unpaired scatter (452.4K)
    280,       # forces st=1 channel tiling, paired gfeat (262.4K)
    240,       # st=1 AND unpaired scatter (232.4K)
])
def test_bwd_vw_budget_ladder_matches_xla(monkeypatch, cap_kb):
    """The vw backward's fallback ladder (paired gfeat -> unpaired ->
    channel-tiled) stays exact at every rung."""
    monkeypatch.setenv('KGDET_DEFORM_BWD', 'vw')
    monkeypatch.setattr(pd, 'VW_BWD_CAP', cap_kb * 1024)
    rng = np.random.RandomState(12)
    B, H, W, C, K, P = 1, 5, 6, 256, 5, pd.TP + 3
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 6, (B, P, K, 2)).astype(np.float32))

    def loss_h(f, p):
        return jnp.sum(pd.deform_sample_hybrid(f, p) ** 2)

    def loss_x(f, p):
        return jnp.sum(bilinear_gather(f, p) ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1))(feat, pos)
    gx = jax.grad(loss_x, argnums=(0, 1))(feat, pos)
    np.testing.assert_allclose(np.asarray(gh[0]), np.asarray(gx[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh[1]), np.asarray(gx[1]),
                               rtol=1e-4, atol=1e-3)


def test_bwd_vw_falls_back_to_v2_when_slab_too_big(monkeypatch):
    monkeypatch.setenv('KGDET_DEFORM_BWD', 'vw')
    monkeypatch.setattr(pd, 'VW_BWD_CAP', 0)   # nothing fits
    assert pd._deform_bwd_vw(
        jnp.zeros((1, 4, 5, 128)), jnp.zeros((1, 3, 2, 2)),
        jnp.zeros((1, 3, 2, 128))) is None
    # and the dispatcher still produces the exact gradient via v2
    rng = np.random.RandomState(13)
    feat = jnp.asarray(rng.randn(1, 4, 5, 128).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0, 3, (1, 3, 2, 2)).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 3, 2, 128).astype(np.float32))
    gf, gp = pd._deform_bwd_pallas(feat, pos, g)
    _, vjp = jax.vjp(bilinear_gather, feat, pos)
    xf, xp = vjp(g)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(xf), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(xp), atol=1e-4)


def _fused_xla(feat, pos, w):
    cols = bilinear_gather(feat, pos)
    return jnp.einsum('bpkc,kcf->bpf', cols, w,
                      preferred_element_type=jnp.float32).astype(feat.dtype)


def test_fused_conv_matches_xla():
    """Fused gather+contract kernel == XLA gather + einsum."""
    rng = np.random.RandomState(7)
    B, H, W, C, K, F, P = 1, 5, 6, 128, 4, 128, 7
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 6, (B, P, K, 2)).astype(np.float32))
    w = jnp.asarray((rng.randn(K, C, F) * 0.1).astype(np.float32))
    got = pd._fused_impl(feat, pos, w)
    want = _fused_xla(feat, pos, w)
    assert got.shape == (B, P, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize('C', [128, 256])
def test_fused_conv_vw_variant_matches_xla(monkeypatch, C):
    """Vector-weight lerp variant (VMEM (8,4) weight slices + packed
    corner segment multiplies) == XLA, at S=1 and S=2."""
    monkeypatch.setenv('KGDET_DEFORM_FWD', 'vw')
    rng = np.random.RandomState(9)
    B, H, W, K, F, P = 1, 5, 6, 4, 128, 2 * pd.TPF + 5
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 6, (B, P, K, 2)).astype(np.float32))
    w = jnp.asarray((rng.randn(K, C, F) * 0.1).astype(np.float32))
    got = pd._fused_impl(feat, pos, w)
    want = _fused_xla(feat, pos, w)
    assert got.shape == (B, P, F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize('budget_kb,tier', [
    (2048, 'auto'),    # full paired slab fits (classic single-call path)
    (700, 'tiled'),    # st=1 channel tiling: paired + vw, f32 partials
    (700, 'auto'),     # hivmem: full-paired under raised vmem_limit_bytes
    (500, 'tiled'),    # nothing paired fits -> unpaired full-S fallback
    (500, 'hivmem'),   # forced hivmem still full-paired
])
def test_fused_conv_channel_tiled_matches_xla(monkeypatch, budget_kb, tier):
    """The round-5 fused tier ladder (full paired -> hivmem ->
    channel-tiled -> unpaired) stays exact at every rung."""
    monkeypatch.setenv('KGDET_DEFORM_FWD', 'vw')
    monkeypatch.setenv('KGDET_FUSED_TIER', tier)
    monkeypatch.setattr(pd, 'FUSED_VMEM_BUDGET', budget_kb * 1024)
    rng = np.random.RandomState(11)
    B, H, W, C, K, F, P = 2, 5, 6, 256, 4, 128, pd.TPF + 9
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-1, 6, (B, P, K, 2)).astype(np.float32))
    w = jnp.asarray((rng.randn(K, C, F) * 0.1).astype(np.float32))
    got = pd._fused_impl(feat, pos, w)
    want = _fused_xla(feat, pos, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_fused_gate_accepts_tiled_big_map_shape(monkeypatch):
    """Stride-8 25-tap column (HW=16128, C=F=256, bf16): the full unpaired
    footprint exceeds the budget but both round-5 tiers fit (st=1 tiled;
    full-paired under hivmem), so the gate engages the fused path there."""
    HW, C, K, F = 16128, 256, 25, 256
    assert HW * C * 2 + K * C * F * 2 + pd.TPF * K * C * 2 \
        > pd.FUSED_VMEM_BUDGET
    assert pd._fused_paired_tile(HW, C // pd.LANE, K, F, 2) == 1
    for tier, want in [('tiled', (1, False)),
                       ('hivmem', (C // pd.LANE, True)),
                       ('auto', (C // pd.LANE, True))]:
        monkeypatch.setenv('KGDET_FUSED_TIER', tier)
        assert pd._fused_tier(HW, C // pd.LANE, K, F, 2) == want, tier
        assert pd.use_fused_deform(HW, C, K, F, 2, platform='tpu'), tier


def test_fused_tier_serial_stride8_pts_call(monkeypatch):
    """The serial head's stride-8 pts call (HW=16128, C=256, K=9, F=512,
    bf16) passed the classic gate UNPAIRED in round 4 (paired 2x slab
    ~20M > budget); round-5 'auto' upgrades it to full-paired hivmem."""
    HW, C, K, F = 16128, 256, 9, 512
    S = C // pd.LANE
    assert HW * C * 2 + K * C * F * 2 + pd.TPF * K * C * 2 \
        <= pd.FUSED_VMEM_BUDGET           # classic unpaired gate passes
    monkeypatch.setenv('KGDET_FUSED_TIER', 'auto')
    assert pd._fused_tier(HW, S, K, F, 2) == (S, True)
    monkeypatch.setenv('KGDET_FUSED_TIER', 'unpaired')   # round-4 layout
    assert pd._fused_tier(HW, S, K, F, 2) == (0, False)
    assert pd.use_fused_deform(HW, C, K, F, 2, platform='tpu')


def test_fused_gate_rejects_tiled_shape_without_pairing(monkeypatch):
    monkeypatch.setenv('KGDET_DEFORM_FWD', 'v1')   # pairing off
    assert not pd.use_fused_deform(16128, 256, 25, 256, 2, platform='tpu')


def test_fused_conv_gradients_match():
    rng = np.random.RandomState(8)
    B, H, W, C, K, F, P = 1, 4, 5, 128, 3, 128, 5
    feat = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0.2, 3.2, (B, P, K, 2)).astype(np.float32))
    w = jnp.asarray((rng.randn(K, C, F) * 0.1).astype(np.float32))

    def loss(fn):
        return lambda f, p, ww: jnp.sum(fn(f, p, ww) ** 2)

    gh = jax.grad(loss(pd.deform_conv_fused), argnums=(0, 1, 2))(feat, pos, w)
    gx = jax.grad(loss(_fused_xla), argnums=(0, 1, 2))(feat, pos, w)
    for a, b in zip(gh, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)


def _dual_xla(cls_feat, pts_feat, pos, w_cls, w_pts, taps):
    """XLA reference of deform_columns_dual."""
    cols = pd._split_xla(cls_feat, pts_feat, pos, taps)
    cls_cat = jnp.concatenate([
        jnp.einsum('bpkc,kcf->bpf', c, w_cls[i])
        for i, (c, _) in enumerate(cols)], axis=-1)
    kpt_cat = jnp.concatenate([
        jnp.einsum('bpkc,kcf->bpf', p, w_pts[i])
        for i, (_, p) in enumerate(cols)], axis=-1)
    return cls_cat, kpt_cat


def test_dual_path_primal_and_gradients_match():
    """deform_columns_dual: fused primal AND split-kernel vjp == XLA."""
    rng = np.random.RandomState(9)
    B, H, W, C, F, P = 1, 5, 6, 128, 128, 7
    taps = (2, 3)
    K = sum(taps)
    cf = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pf = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0.2, 4.2, (B, P, K, 2)).astype(np.float32))
    w_cls = tuple(jnp.asarray((rng.randn(t, C, F) * 0.1).astype(np.float32))
                  for t in taps)
    w_pts = tuple(jnp.asarray((rng.randn(t, C, F) * 0.1).astype(np.float32))
                  for t in taps)

    got = pd.deform_columns_dual(cf, pf, pos, w_cls, w_pts, taps)
    want = _dual_xla(cf, pf, pos, w_cls, w_pts, taps)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)

    def loss(fn):
        return lambda *args: sum(jnp.sum(o ** 2)
                                 for o in fn(*args, w_pts, taps))

    gh = jax.grad(loss(pd.deform_columns_dual), argnums=(0, 1, 2, 3))(
        cf, pf, pos, w_cls)
    gx = jax.grad(loss(_dual_xla), argnums=(0, 1, 2, 3))(cf, pf, pos, w_cls)
    for a, b in zip(jax.tree.leaves(gh), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize('dual_raw', ['1', '0', 'res'])
def test_dual_path_raw_vw_vjp_matches_xla(monkeypatch, dual_raw):
    """The vjp's split-kernel forward with the vw raw (pixels-in-sublanes)
    column layout: primal einsum + weight grads + feature/pos grads == XLA,
    under every KGDET_DUAL_RAW consumption mode (raw everywhere /
    transpose-before-contract / transposed residual). KGDET_DEFORM_SPLIT=vw
    forces the vw split walk (shipped default is 'pair' — see
    split_walk_vector_weights); use_pallas_split is forced on so the CPU
    run drives the same code the TPU training step does."""
    monkeypatch.setenv('KGDET_DEFORM_FWD', 'vw')
    monkeypatch.setenv('KGDET_DEFORM_SPLIT', 'vw')
    monkeypatch.setenv('KGDET_DUAL_RAW', dual_raw)
    monkeypatch.setattr(pd, 'use_pallas_split', lambda *a: True)
    rng = np.random.RandomState(13)
    B, H, W, C, F = 1, 5, 6, 128, 128
    P = pd.TP + 3          # pad path: n_pt * TP != P
    taps = (2, 3)
    K = sum(taps)
    cf = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pf = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0.2, 4.2, (B, P, K, 2)).astype(np.float32))
    w_cls = tuple(jnp.asarray((rng.randn(t, C, F) * 0.1).astype(np.float32))
                  for t in taps)
    w_pts = tuple(jnp.asarray((rng.randn(t, C, F) * 0.1).astype(np.float32))
                  for t in taps)

    def loss(fn):
        return lambda *args: sum(jnp.sum(o ** 2)
                                 for o in fn(*args, taps))

    prim, vjp = jax.vjp(
        lambda cf, pf, pos, wc, wp: pd.deform_columns_dual(
            cf, pf, pos, wc, wp, taps), cf, pf, pos, w_cls, w_pts)
    want_prim = _dual_xla(cf, pf, pos, w_cls, w_pts, taps)
    for a, b in zip(prim, want_prim):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
    ct = tuple(2.0 * p for p in prim)      # d/dx sum(o^2)
    gh = vjp(ct)
    gx = jax.grad(
        lambda cf, pf, pos, wc, wp: sum(
            jnp.sum(o ** 2)
            for o in _dual_xla(cf, pf, pos, wc, wp, taps)),
        argnums=(0, 1, 2, 3, 4))(cf, pf, pos, w_cls, w_pts)
    for a, b in zip(jax.tree.leaves(gh), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-3)
