"""Pallas TPU kernel for deformable bilinear sampling.

XLA's gather lowering moves ~100GB/s on deformable-conv access patterns (the
KGDet hot op: 83 taps x H*W pixels x 1024 channels, arbitrary positions).
This kernel keeps the whole stride-32 feature map resident in VMEM and walks
the taps with dynamic vector loads, so each tap costs two (2, 8, 128)-vreg
reads instead of an HBM gather descriptor:

  samples[b, p, k, :] = sum_{i,j in 2x2} w4[b, p, k, i, j] * feat[b, r_ij, :]

Index/weight preparation (floor/frac/clamping, out-of-bounds zeroing) runs in
XLA on small (B, P, K) tensors; the kernel is a pure weighted-gather.

Backward is also a Pallas kernel (_bwd_kernel): the feature gradient is a
scatter-accumulate into a VMEM-resident gradient map, and the position
gradient is produced by the same tap walk — the kernel loads the four
corner rows (already VMEM-resident), forms the analytic coordinate
derivative vectors, and reduces them against the cotangent to per-tap
(grad_y, grad_x) scalars. No XLA patch re-gather on the backward path
(the CUDA analog is the col2im_coord kernel,
deform_conv_cuda_kernel.cu:145-188,279-465).

Maps too large for VMEM are channel-tiled: the grid gains a lane-slice
dimension, each (HW, slice, 128) feature slab stays resident across the
pixel-tile sweep, and per-slice position-gradient partials are summed in
XLA. This keeps the serial/parallel heads' stride-8/16 levels on the
Pallas path instead of falling back to the XLA gather.

Parity: CUDA deformable_im2col (reference deform_conv_cuda_kernel.cu:84-245).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TP = 16          # pixels per grid step (out block 2.7MB bf16 double-buffered)


def _interp_v1(tl, tr, bl, br, w00, w01, w10, w11):
    """Per-corner scalar*vector lerp: 4 casts + 4 mults + 3 adds, each on a
    (S, LANE) slice — at S=2 that is 2 sublanes of 8, ~25% vreg occupancy.
    The on-chip A/B (tools/profile_deform_variants.py, round 4) showed the
    walk is LOAD-issue bound, not VPU-arith bound: a corner-packed
    full-vreg variant of this arithmetic measured within 6% either way, so
    the simple form is kept and the load count is attacked instead
    (row pairing below)."""
    return (tl.astype(jnp.float32) * w00
            + tr.astype(jnp.float32) * w01
            + bl.astype(jnp.float32) * w10
            + br.astype(jnp.float32) * w11)


def _load_corners(feat_ref, starts_ref, p, k, *, paired):
    """The four bilinear corner rows of one tap.

    Unpaired slab (HW, S, LANE): two dynamic loads — ds(r0, 2) is the
    (x, x+1) top pair, ds(r1, 2) the bottom pair. Paired slab
    (HW, 2, S, LANE) where [r, 1] pre-stores row r+W: ONE load ds(r0, 2)
    yields [[tl, bl], [tr, br]] — half the dynamic loads, and the r1
    SMEM read disappears from the (scalar-pipeline-bound) tap walk."""
    r0 = starts_ref[0, 0, p, 2 * k]
    if paired:
        c4 = feat_ref[0, pl.ds(r0, 2)]       # (2, 2, S, LANE)
        return c4[0, 0], c4[1, 0], c4[0, 1], c4[1, 1]
    r1 = starts_ref[0, 0, p, 2 * k + 1]
    top = feat_ref[0, pl.ds(r0, 2)]          # (2, S, LANE)
    bot = feat_ref[0, pl.ds(r1, 2)]
    return top[0], top[1], bot[0], bot[1]


def use_paired_rows():
    import os
    return os.environ.get('KGDET_DEFORM_FWD', 'vw') in ('pair', 'vw')


def use_vector_weights():
    """'vw' (default): lerp weights arrive as a VMEM (8, 4) slice per
    pixel group and the interpolation runs as four full-width segment
    multiplies over the packed corner tile, instead of 4 SMEM scalar
    reads + 4 quarter-width scalar*vector ops per pixel. Requires the
    paired slab (the packed (2, 2, S, LANE) corner load). On-chip A/B
    (tools/profile_deform_variants.py, round 4): k49 3.32 -> 1.73 ms,
    k25 1.19 -> 0.92, k9 0.50 -> 0.42 — the walk was scalar-issue bound,
    not vector-load bound."""
    import os
    return os.environ.get('KGDET_DEFORM_FWD', 'vw') == 'vw'


def split_walk_vector_weights():
    """Walk choice for the SPLIT (training-path) kernel, independent of the
    fused kernels: the vw walk is faster in-kernel but can only write its
    pixels-in-sublanes raw layout, and every downstream matmul (column
    contract, weight grad) or explicit transpose back to (B, P, t, C) pays
    a relayout of the full column tensor that exceeds the walk's gain.
    On-chip block-vjp A/B at the cascade concat83 shape (batch 8,
    tools/profile_deform_variants.py --dual-only --grad): pair 32.55 ms,
    vw+raw 35.11, vw+transpose-first 33.03, vw+transposed-residual 35.11
    — so 'pair' (scalar-weight walk, standard-layout writes) is the
    default here while the fused kernels keep vw. KGDET_DEFORM_SPLIT=vw
    re-enables the vw split walk for A/B."""
    import os
    return (use_vector_weights()
            and os.environ.get('KGDET_DEFORM_SPLIT', 'pair') == 'vw')


def pair_rows(feat_r, W):
    """(B, HW, S, LANE) -> (B, HW, 2, S, LANE); [:, r, 1] is row r + W
    (zero tail — only reachable with zero lerp weight). One cheap XLA copy
    per call that halves the kernel's dynamic-load count."""
    below = jnp.concatenate(
        [feat_r[:, W:], jnp.zeros_like(feat_r[:, :W])], axis=1)
    return jnp.stack([feat_r, below], axis=2)

# VMEM budgets for the resident feature slab. Forward keeps one slab;
# backward keeps the slab plus an f32 gradient slab of the same extent.
FWD_SLAB_BUDGET = 6 * 1024 * 1024
BWD_SLAB_BUDGET = 13 * 1024 * 1024


def slice_tiles(HW: int, S: int, itemsize: int, fwd_factor: int = 1):
    """Largest lane-slice count per grid step (divisor of S) whose resident
    slabs fit the fwd/bwd VMEM budgets; None if even one slice is too big.
    fwd_factor scales only the forward slab (2 for row-paired slabs — the
    backward kernel always keeps the plain slab)."""
    for st in range(S, 0, -1):
        if S % st:
            continue
        slab = HW * st * LANE * itemsize
        if slab * fwd_factor <= FWD_SLAB_BUDGET and \
                HW * st * LANE * (itemsize + 4) <= BWD_SLAB_BUDGET:
            return st
    return None


def _prep_indices(pos_yx, H, W):
    """Row starts + 2x2 lerp weights from absolute (y, x) positions.

    pos_yx: (B, P, K, 2) float. Returns starts (B, P, K, 2) int32 row indices
    [r_top, r_bottom] into the (H*W)-flattened map, and w4 (B, P, K, 4) f32
    weights ordered (tl, tr, bl, br) with out-of-bounds corners zeroed.
    """
    pos_dtype = jnp.promote_types(pos_yx.dtype, jnp.float32)
    y = pos_yx[..., 0].astype(pos_dtype)
    x = pos_yx[..., 1].astype(pos_dtype)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    dy = y - y0
    dx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0c = jnp.clip(y0i, 0, max(H - 2, 0))
    x0c = jnp.clip(x0i, 0, max(W - 2, 0))

    def axis_w(c0c, c0i, frac):
        out = []
        for slot in (0, 1):
            cc = c0c + slot
            out.append(jnp.where(cc == c0i, 1.0 - frac,
                                 jnp.where(cc == c0i + 1, frac, 0.0)))
        return out

    wy = axis_w(y0c, y0i, dy)
    wx = axis_w(x0c, x0i, dx)
    w4 = jnp.stack([wy[0] * wx[0], wy[0] * wx[1],
                    wy[1] * wx[0], wy[1] * wx[1]],
                   axis=-1).astype(jnp.float32)
    starts = jnp.stack([y0c * W + x0c, (y0c + 1) * W + x0c], axis=-1)
    return starts, w4


def _sample_kernel(starts_ref, w_ref, feat_ref, out_ref, *, K, n_lane_tiles,
                   paired):
    """One (b, p-tile) step: gather TP*K taps from the VMEM-resident map.

    feat_ref: (1, HW, S, LANE), or (1, HW, 2, S, LANE) row-paired.
    out_ref: (1, TP, K, S, LANE).
    """
    def body(p, _):
        # k unrolled: no div/mod on the hot path, more load-level ILP
        for k in range(K):
            w00 = w_ref[0, 0, p, 4 * k]
            w01 = w_ref[0, 0, p, 4 * k + 1]
            w10 = w_ref[0, 0, p, 4 * k + 2]
            w11 = w_ref[0, 0, p, 4 * k + 3]
            tl, tr, bl, br = _load_corners(feat_ref, starts_ref, p, k,
                                           paired=paired)
            val = _interp_v1(tl, tr, bl, br, w00, w01, w10, w11)
            out_ref[0, p, k] = val.astype(out_ref.dtype)
        return 0

    lax.fori_loop(0, TP, body, 0)


def deform_sample_pallas(feat, pos_yx):
    """Pallas forward of bilinear sampling at absolute positions.

    feat: (B, H, W, C) with C a multiple of 128; pos_yx: (B, P, K, 2).
    Returns (B, P, K, C) in feat.dtype. Maps larger than the VMEM slab
    budget are channel-tiled: the grid gains a lane-slice dimension and
    each slab stays resident across the inner pixel-tile sweep.
    """
    B, H, W, C = feat.shape
    _, P, K, _ = pos_yx.shape
    assert C % LANE == 0, C
    S = C // LANE
    paired = use_paired_rows()
    st = None
    if paired:                         # paired slab is 2x: may not fit
        st = slice_tiles(H * W, S, feat.dtype.itemsize, fwd_factor=2)
        if st is None:
            paired = False
    if st is None:
        st = slice_tiles(H * W, S, feat.dtype.itemsize)
    assert st is not None, feat.shape
    n_s = S // st

    starts, w4 = _prep_indices(pos_yx, H, W)
    P_pad = -(-P // TP) * TP
    if P_pad != P:
        pad = [(0, 0), (0, P_pad - P), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad)
        w4 = jnp.pad(w4, pad)
    # SMEM windows: make the block's trailing dims equal to the array dims
    # (satisfies the (8, 128)-divisibility rule without tile padding)
    starts = starts.reshape(B, P_pad // TP, TP, K * 2)
    w4 = w4.reshape(B, P_pad // TP, TP, K * 4)

    feat_r = feat.reshape(B, H * W, S, LANE)
    n_pt = P_pad // TP

    def run_slice(feat_slab):
        """One pallas_call over an (B, HW, st, LANE) channel slab (row-
        paired: (B, HW, 2, st, LANE)). Mosaic requires the trailing block
        dims to equal the array dims, so tiling is expressed as one call
        per slab (XLA slices are cheap relative to the gather work)."""
        if paired:
            feat_slab = pair_rows(feat_slab, W)
            feat_spec = pl.BlockSpec((1, H * W, 2, st, LANE),
                                     lambda b, t: (b, 0, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
        else:
            feat_spec = pl.BlockSpec((1, H * W, st, LANE),
                                     lambda b, t: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_sample_kernel, K=K, n_lane_tiles=st,
                              paired=paired),
            out_shape=jax.ShapeDtypeStruct(
                (B, P_pad, K, st, LANE), feat.dtype),
            grid=(B, n_pt),
            in_specs=[
                pl.BlockSpec((1, 1, TP, K * 2), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, TP, K * 4), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                feat_spec,
            ],
            out_specs=pl.BlockSpec((1, TP, K, st, LANE),
                                   lambda b, t: (b, t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(starts, w4, feat_slab)

    if n_s == 1:
        out = run_slice(feat_r)
    else:
        out = jnp.concatenate(
            [run_slice(feat_r[:, :, s * st:(s + 1) * st])
             for s in range(n_s)], axis=3)
    out = out.reshape(B, P_pad, K, C)
    return out[:, :P] if P_pad != P else out


@jax.custom_vjp
def deform_sample_hybrid(feat, pos_yx):
    """Pallas forward + XLA backward deformable sampling (absolute pos)."""
    return deform_sample_pallas(feat, pos_yx)


def _hybrid_fwd(feat, pos_yx):
    return deform_sample_pallas(feat, pos_yx), (feat, pos_yx)


def _hybrid_bwd(res, g):
    feat, pos_yx = res
    return _deform_bwd_pallas(feat, pos_yx, g)


deform_sample_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


# ---------------------------------------------------------------------------
# v2: column/branch-split sampling — one gather pass, 2*len(taps) contiguous
# outputs, so the per-column contractions downstream need no slicing (which
# XLA turns into whole-tensor copies) and no zero-padded block-diagonal.
# ---------------------------------------------------------------------------
def _split_kernel(starts_ref, w_ref, feat_ref, *out_refs, K, taps, s_half,
                  paired, vw=False):
    """out_refs: taps-major, branch-minor: (cls_t0, pts_t0, cls_t1, ...).

    vw=True (vector-weight walk, requires paired): out blocks are
    pixels-in-sublanes (1, 1, t, s_half, TP, LANE) so the walk's (8, LANE)
    tiles store at sublane-aligned dynamic offsets; the wrapper transposes
    back to (B, P, t, C) outside (folded into the downstream column
    contraction by XLA)."""
    bounds = []
    off = 0
    for t in taps:
        bounds.append((off, off + t))
        off += t

    if vw:
        def store(s, base, k, tile8):
            ci = next(i for i, (lo, hi) in enumerate(bounds) if lo <= k < hi)
            lo = bounds[ci][0]
            ref = out_refs[2 * ci + (0 if s < s_half else 1)]
            ref[0, 0, k - lo, s % s_half, pl.ds(base, 8)] = tile8

        _gather_tile(starts_ref, w_ref, feat_ref, store, K=K, S=2 * s_half,
                     paired=True, dtype=out_refs[0].dtype, vw=True, n_pix=TP)
        return

    def body(p, _):
        for k in range(K):
            w00 = w_ref[0, 0, p, 4 * k]
            w01 = w_ref[0, 0, p, 4 * k + 1]
            w10 = w_ref[0, 0, p, 4 * k + 2]
            w11 = w_ref[0, 0, p, 4 * k + 3]
            tl, tr, bl, br = _load_corners(feat_ref, starts_ref, p, k,
                                           paired=paired)
            val = _interp_v1(tl, tr, bl, br, w00, w01, w10, w11)
            ci = next(i for i, (lo, hi) in enumerate(bounds) if lo <= k < hi)
            lo = bounds[ci][0]
            cls_ref = out_refs[2 * ci]
            pts_ref = out_refs[2 * ci + 1]
            cls_ref[0, p, k - lo] = val[:s_half].astype(cls_ref.dtype)
            pts_ref[0, p, k - lo] = val[s_half:].astype(pts_ref.dtype)
        return 0

    lax.fori_loop(0, TP, body, 0)


def deform_sample_split_pallas(cls_feat, pts_feat, pos_yx, taps, raw=False):
    """Sample cls/pts branches at shared taps, outputs split per column.

    cls_feat/pts_feat: (B, H, W, C); pos_yx: (B, P, K, 2) with K == sum(taps).
    Returns a list of len(taps) pairs: [(cls_(B,P,t,C), pts_(B,P,t,C)), ...].

    raw=True: when the vector-weight walk is active, skip the transpose
    back to (B, P, t, C) and return the kernel's native pixels-in-sublanes
    layout (B, n_pt, t, S, TP, LANE) with zero-padded pixels — consumers
    contract it directly (einsum 'bnkstl,kslf->bntf' needs no relayout:
    lanes are minor and pixels are the sublane/M dim), saving a full-tensor
    XLA copy per call (~1.7 ms at the batch-8 cascade shapes). Ignored
    (plain layout returned, raw-ness signalled by the 4-d shape) when the
    vw walk is gated off."""
    B, H, W, C = cls_feat.shape
    _, P, K, _ = pos_yx.shape
    assert K == sum(taps) and C % LANE == 0
    S = C // LANE

    feat = jnp.concatenate([cls_feat, pts_feat], axis=-1)
    starts, w4 = _prep_indices(pos_yx, H, W)
    P_pad = -(-P // TP) * TP
    if P_pad != P:
        pad = [(0, 0), (0, P_pad - P), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad)
        w4 = jnp.pad(w4, pad)
    starts = starts.reshape(B, P_pad // TP, TP, K * 2)
    feat_r = feat.reshape(B, H * W, 2 * S, LANE)
    n_pt = P_pad // TP
    paired = use_paired_rows() and slice_tiles(
        H * W, 2 * S, feat.dtype.itemsize, fwd_factor=2) == 2 * S
    vw = split_walk_vector_weights() and paired
    if vw:
        # corner order of the packed (2, 2, 2S, LANE) load: (tl, bl, tr, br)
        w4 = w4[..., jnp.array([0, 2, 1, 3])]
    w4 = w4.reshape(B, P_pad // TP, TP, K * 4)
    if paired:
        feat_r = pair_rows(feat_r, W)
        feat_spec = pl.BlockSpec((1, H * W, 2, 2 * S, LANE),
                                 lambda b, i: (b, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        feat_spec = pl.BlockSpec((1, H * W, 2 * S, LANE),
                                 lambda b, i: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    out_shapes, out_specs = [], []
    for t in taps:
        for _branch in range(2):
            if vw:
                out_shapes.append(jax.ShapeDtypeStruct(
                    (B, n_pt, t, S, TP, LANE), feat.dtype))
                out_specs.append(pl.BlockSpec(
                    (1, 1, t, S, TP, LANE), lambda b, i: (b, i, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM))
            else:
                out_shapes.append(jax.ShapeDtypeStruct(
                    (B, P_pad, t, S, LANE), feat.dtype))
                out_specs.append(pl.BlockSpec(
                    (1, TP, t, S, LANE), lambda b, i: (b, i, 0, 0, 0),
                    memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_split_kernel, K=K, taps=tuple(taps), s_half=S,
                          paired=paired, vw=vw),
        out_shape=tuple(out_shapes),
        grid=(B, n_pt),
        in_specs=[
            pl.BlockSpec((1, 1, TP, K * 2), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TP, K * 4), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM if vw else pltpu.SMEM),
            feat_spec,
        ],
        out_specs=tuple(out_specs),
    )(starts, w4, feat_r)

    result = []
    for ci, t in enumerate(taps):
        pair = []
        for br in range(2):
            o = outs[2 * ci + br]
            if vw and raw:
                pair.append(o)
                continue
            if vw:
                o = o.transpose(0, 1, 4, 2, 3, 5)
            o = o.reshape(B, P_pad, t, C)
            pair.append(o[:, :P] if P_pad != P else o)
        result.append(tuple(pair))
    return result


# ---------------------------------------------------------------------------
# v3: fused gather+contract — the sampled columns never touch HBM. Per
# (batch, pixel-tile) grid step the kernel walks the taps into a VMEM
# scratch laid out (TPF, K*C) (contraction flat in lanes) and immediately
# contracts it against the VMEM-resident (K*C, F) weight on the MXU. At
# KGDet head shapes this removes ~680 MB of column HBM traffic per cascade
# block; at serial stride-8 shapes ~1.2 GB per level.
# ---------------------------------------------------------------------------
TPF = 128        # pixels per fused grid step (the MXU M dimension)
FUSED_VMEM_BUDGET = 12 * 1024 * 1024


def _fused_paired_tile(HW, S, K, F, item):
    """Largest lane-slice count (divisor of S) whose row-paired fused
    footprint — paired slab + weight slice + gather scratch, plus the
    channel-tiled path's double-buffered f32 out block when st < S — fits
    FUSED_VMEM_BUDGET; 0 if none."""
    st = S
    while st:
        extra = 0 if st == S else 2 * TPF * F * 4
        if (2 * HW * st * LANE * item + K * st * LANE * F * item
                + TPF * K * st * LANE * item + extra) <= FUSED_VMEM_BUDGET:
            return st
        st -= 1
        while st and S % st:
            st -= 1
    return 0


# High-VMEM tier (round 5): when the full-S paired footprint exceeds the
# classic fused budget (sized against the default ~16M scoped-VMEM cap),
# prefer ONE full-paired kernel compiled with a raised vmem_limit_bytes
# over channel tiling — tiling multiplies the load-issue count (each
# pixel-tap re-walks the slab once per slice) while v5e has 128M of
# physical VMEM. KGDET_FUSED_TIER forces a tier for A/B: 'hivmem' |
# 'tiled' | 'auto' (default: hivmem when it fits, else tiled).
FUSED_HIVMEM_CAP = 100 * 1024 * 1024
FUSED_HIVMEM_MARGIN = 8 * 1024 * 1024


def _fused_paired_need(HW, S, K, F, item):
    return 2 * HW * S * LANE * item + K * S * LANE * F * item \
        + TPF * K * S * LANE * item


def _fused_tier(HW, S, K, F, item):
    """(st, hivmem) for the fused kernel: st == S, hivmem False -> classic
    single full-paired call; st == S, hivmem True -> full-paired under a
    raised vmem_limit_bytes; 0 < st < S -> channel-tiled; st == 0 ->
    pairing off or nothing fits (caller goes unpaired full-S).
    KGDET_FUSED_TIER forces a tier for A/B: 'hivmem' | 'tiled' |
    'unpaired' | 'auto'."""
    import os
    tier = os.environ.get('KGDET_FUSED_TIER', 'auto')
    if not use_paired_rows() or tier == 'unpaired':
        return 0, False
    st = _fused_paired_tile(HW, S, K, F, item)
    if st == S:
        return st, False
    # the kernel's whole OUTPUT array is stack-allocated in scoped VMEM by
    # XLA (measured on chip: f32[1,16128,256] out alone blew the 16M
    # default), so feasibility must count it alongside the resident set
    need = _fused_paired_need(HW, S, K, F, item) + HW * F * 4
    if tier in ('auto', 'hivmem') \
            and need + FUSED_HIVMEM_MARGIN <= FUSED_HIVMEM_CAP:
        return S, True
    if tier == 'hivmem':
        return 0, False
    return st, False


def use_fused_deform(HW: int, C: int, K: int, F: int, itemsize: int,
                     platform=None):
    """Fused-kernel gate: feature slab + weight + gather scratch resident."""
    import os
    if os.environ.get('KGDET_DISABLE_PALLAS') \
            or os.environ.get('KGDET_DISABLE_FUSED'):
        return False
    if C % LANE or F % LANE:
        return False
    # sized for the full unpaired slab — or, when that is over budget, the
    # round-5 paired tiers: full-paired under a raised VMEM limit, or the
    # channel-tiled path (serial stride-8 k25: the full slab blows the
    # budget but a one-lane-slice paired slab fits)
    need = HW * C * itemsize + K * C * F * itemsize \
        + TPF * K * C * itemsize
    if need > FUSED_VMEM_BUDGET \
            and not _fused_tier(HW, C // LANE, K, F, itemsize)[0]:
        return False
    if platform is None:
        try:
            platform = jax.devices()[0].platform
        except Exception:
            return False
    return platform == 'tpu'


def _gather_tile(starts_ref, w_ref, feat_ref, store, *, K, S, paired,
                 dtype, vw=False, n_pix=None):
    """Tap walk for one n_pix-pixel tile (default TPF). Pixels are walked in
    sublane-aligned groups of 8: each tap's 8 per-pixel (LANE,) values are
    stacked in registers and handed to `store(s, base, k, tile8)` as
    (8, LANE) tiles (Mosaic implements dynamic stores only at aligned
    sublane offsets).

    vw=True (requires paired): w_ref is a VMEM f32 (TPF, K*4) block whose
    per-tap corner order matches the packed c4 load's flattening
    (tl, bl, tr, br). The 8 pixels' packed corner loads are stacked to
    (8, 4*S*LANE) and the lerp is 4 segment multiplies against (8, 1)
    weight columns — no SMEM weight reads, no quarter-width ops, and the
    per-s store is a static lane slice."""
    SL = S * LANE

    def body_vw(pg, _):
        base = pg * 8
        for k in range(K):
            cs = []
            for pr in range(8):
                r0 = starts_ref[0, 0, base + pr, 2 * k]
                cs.append(feat_ref[0, pl.ds(r0, 2)])  # (2, 2, S, LANE)
            c = jnp.stack(cs).reshape(8, 4 * SL).astype(jnp.float32)
            wt = w_ref[0, 0, pl.ds(base, 8), 4 * k:4 * (k + 1)]  # (8, 4)
            val = (c[:, :SL] * wt[:, 0:1]
                   + c[:, SL:2 * SL] * wt[:, 1:2]
                   + c[:, 2 * SL:3 * SL] * wt[:, 2:3]
                   + c[:, 3 * SL:] * wt[:, 3:4])
            tile = val.astype(dtype)
            for s in range(S):
                store(s, base, k, tile[:, s * LANE:(s + 1) * LANE])
        return 0

    def body(pg, _):
        base = pg * 8
        for k in range(K):
            rows = []
            for pr in range(8):
                p = base + pr
                w00 = w_ref[0, 0, p, 4 * k]
                w01 = w_ref[0, 0, p, 4 * k + 1]
                w10 = w_ref[0, 0, p, 4 * k + 2]
                w11 = w_ref[0, 0, p, 4 * k + 3]
                tl, tr, bl, br = _load_corners(feat_ref, starts_ref, p, k,
                                               paired=paired)
                val = _interp_v1(tl, tr, bl, br, w00, w01, w10, w11)
                rows.append(val.astype(dtype))
            tile = jnp.stack(rows)               # (8, S, LANE)
            for s in range(S):
                store(s, base, k, tile[:, s, :])
        return 0

    lax.fori_loop(0, (TPF if n_pix is None else n_pix) // 8,
                  body_vw if vw else body, 0)


def _fused_kernel(starts_ref, w_ref, feat_ref, wt_ref, out_ref, scratch_ref,
                  *, K, S, paired, vw=False):
    """Gather K taps x C channels for TPF pixels into a VMEM scratch, then
    contract on the MXU. The scratch is (S, TPF, K*LANE) with (TPF, K*LANE)
    the tiled dims. The contraction is S accumulated
    (TPF, K*LANE) @ (K*LANE, F) dots — weight pre-permuted to
    (S, K*LANE, F) so slice s contracts lane-slice s of every tap."""
    def store(s, base, k, tile8):
        scratch_ref[s, pl.ds(base, 8), pl.ds(k * LANE, LANE)] = tile8

    _gather_tile(starts_ref, w_ref, feat_ref, store, K=K, S=S,
                 paired=paired, dtype=scratch_ref.dtype, vw=vw)
    acc = jnp.dot(scratch_ref[0], wt_ref[0],
                  preferred_element_type=jnp.float32)
    for s in range(1, S):
        acc += jnp.dot(scratch_ref[s], wt_ref[s],
                       preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)



# Negative result (round 4, on-chip A/B via tools/profile_deform_variants):
# a software-pipelined two-phase variant of _fused_kernel — grid of
# n_tiles+1 steps, step t emitting tile t-1's MXU contraction before
# gathering tile t into the other scratch phase — measured IDENTICAL to
# the sequential kernel (k49 3.315 vs 3.315 ms, k25 1.196 vs 1.194, k9
# 0.498 vs 0.495 at the batch-8 cascade shapes). The TensorCore is one
# in-order VLIW stream: emission order across pl.when phases does not
# create concurrency, and the contraction's operand loads compete for
# the same load-issue slots the tap walk saturates. Removed; don't retry
# intra-kernel overlap without an independent engine (e.g. DMA-driven
# gather).
def _fused_impl(feat, pos_yx, weight):
    B, H, W, C = feat.shape
    _, P, K, _ = pos_yx.shape
    F = weight.shape[-1]
    S = C // LANE
    starts, w4 = _prep_indices(pos_yx, H, W)
    P_pad = -(-P // TPF) * TPF
    if P_pad != P:
        pad = [(0, 0), (0, P_pad - P), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad)
        w4 = jnp.pad(w4, pad)
    n_pt = P_pad // TPF
    starts = starts.reshape(B, n_pt, TPF, K * 2)
    feat_r = feat.reshape(B, H * W, S, LANE)
    item = feat.dtype.itemsize

    # Row-paired slab selection (round 5): when the full-S 2x paired slab
    # would blow the fused budget (serial stride-8: HW=16128, slab alone
    # 8.25M bf16), run it anyway under a raised vmem_limit_bytes (hivmem
    # tier) or CHANNEL-TILE (per-slice paired slab + weight slice + gather
    # scratch, f32 partial outputs summed in XLA) instead of falling back
    # to the unpaired scalar walk. The vw walk then runs on the largest
    # maps too.
    st, hivmem = _fused_tier(H * W, S, K, F, item)
    paired = bool(st)
    if not paired:
        st = S
    vw = use_vector_weights() and paired
    if vw:
        # corner order of the packed (2, 2, S, LANE) load: (tl, bl, tr, br)
        w4 = w4[..., jnp.array([0, 2, 1, 3])]
    w4 = w4.reshape(B, n_pt, TPF, K * 4)
    # (K, C, F) -> (S, K, LANE, F): lane-slice-major contraction layout
    wt = weight.reshape(K, S, LANE, F).transpose(1, 0, 2, 3) \
        .astype(feat.dtype)

    # one call per (batch element, channel slice), batch index closed over
    # in the index maps: a feature slab whose block index varies along a
    # grid dim gets double-buffered by Mosaic (2x 8.25M at serial stride-8
    # blows the 16M scoped-VMEM limit); an invariant block stays
    # single-buffered
    def run_batch(b, feat_slab, wt_slab, out_dtype):
        kern = functools.partial(_fused_kernel, K=K, S=st, paired=paired,
                                 vw=vw)
        smem_idx = lambda t, b=b: (b, t, 0, 0)  # noqa: E731
        if paired:
            feat_spec = pl.BlockSpec(
                (1, H * W, 2, st, LANE), lambda t, b=b: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM)
        else:
            feat_spec = pl.BlockSpec(
                (1, H * W, st, LANE), lambda t, b=b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM)
        # non-classic paired tiers get an explicit scoped-VMEM limit that
        # covers the resident set PLUS the full output array — XLA stack-
        # allocates the pallas output in scoped VMEM (measured on chip:
        # the tiled path's f32[1,16128,256] partial output alone exceeded
        # the 16M default limit by 416K)
        params = None
        if hivmem or (paired and st < S):
            out_item = 4 if out_dtype == jnp.float32 \
                else feat.dtype.itemsize
            limit = (2 * H * W * st * LANE * item
                     + K * st * LANE * F * item
                     + TPF * K * st * LANE * item
                     + P_pad * F * out_item + FUSED_HIVMEM_MARGIN)
            params = pltpu.CompilerParams(vmem_limit_bytes=limit)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, P_pad, F), out_dtype),
            grid=(n_pt,),
            in_specs=[
                pl.BlockSpec((1, 1, TPF, K * 2), smem_idx,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, TPF, K * 4), smem_idx,
                             memory_space=pltpu.VMEM if vw
                             else pltpu.SMEM),
                feat_spec,
                pl.BlockSpec((st, K * LANE, F), lambda t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TPF, F), lambda t: (0, t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((st, TPF, K * LANE), feat.dtype)],
            compiler_params=params,
        )(starts, w4, feat_slab, wt_slab)

    if st == S:
        feat_in = pair_rows(feat_r, W) if paired else feat_r
        wt_in = wt.reshape(S, K * LANE, F)
        outs = [run_batch(b, feat_in, wt_in, feat.dtype) for b in range(B)]
        out = jnp.concatenate(outs, axis=0) if B > 1 else outs[0]
    else:
        n_sl = S // st
        slabs = [pair_rows(feat_r[:, :, i * st:(i + 1) * st], W)
                 for i in range(n_sl)]
        wsls = [wt[i * st:(i + 1) * st].reshape(st, K * LANE, F)
                for i in range(n_sl)]
        outs = []
        for b in range(B):
            acc = run_batch(b, slabs[0], wsls[0], jnp.float32)
            for i in range(1, n_sl):
                acc = acc + run_batch(b, slabs[i], wsls[i], jnp.float32)
            outs.append(acc)
        out = (jnp.concatenate(outs, axis=0) if B > 1
               else outs[0]).astype(feat.dtype)
    return out[:, :P] if P_pad != P else out


@jax.custom_vjp
def deform_conv_fused(feat, pos_yx, weight):
    """Fused deformable gather+contract: (B,H,W,C), (B,P,K,2), (K,C,F)
    -> (B,P,F). On the non-differentiated (inference) path the columns
    never leave VMEM. Under differentiation the custom_vjp forward rule
    runs instead: it gathers the columns once with the sampling kernel and
    keeps them as residuals, so the backward needs no re-gather — training
    pays exactly the split-path cost while inference gets the fusion."""
    return _fused_impl(feat, pos_yx, weight)


def _fused_fwd(feat, pos_yx, weight):
    samples = deform_sample_pallas(feat, pos_yx)      # (B, P, K, C)
    out = jnp.einsum('bpkc,kcf->bpf', samples, weight.astype(feat.dtype),
                     preferred_element_type=jnp.float32).astype(feat.dtype)
    return out, (samples, feat, pos_yx, weight)


def _fused_bwd(res, g):
    samples, feat, pos_yx, weight = res
    gf = g.astype(jnp.float32)
    g_cols = jnp.einsum('bpf,kcf->bpkc', gf,
                        weight.astype(jnp.float32)).astype(feat.dtype)
    grad_feat, grad_pos = _deform_bwd_pallas(feat, pos_yx, g_cols)
    g_w = jnp.einsum('bpkc,bpf->kcf', samples, g,
                     preferred_element_type=jnp.float32)
    return grad_feat, grad_pos, g_w.astype(weight.dtype)


deform_conv_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# v4: block-level dual path — the whole multi-column, two-branch cascade
# contraction behind one custom_vjp. Inference (non-differentiated) runs the
# fused gather+MXU kernels per (column, branch) with columns never touching
# HBM; under differentiation the forward rule instead gathers ALL taps once
# with the shared split kernel (83 taps over the cls|pts concat — half the
# tap walks of six per-column gathers, at twice the vreg occupancy) and the
# backward reassembles one cotangent and runs ONE fused backward kernel.
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def deform_columns_dual(cls_feat, pts_feat, pos_yx, w_cls, w_pts, taps):
    """cls_feat/pts_feat: (B, H, W, C); pos_yx: (B, P, K, 2), K == sum(taps);
    w_cls/w_pts: tuples of (t, C, F) per column. Returns (cls_cat, kpt_cat)
    each (B, P, len(taps)*F), pre-activation, column-major."""
    outs = {'cls': [], 'pts': []}
    lo = 0
    for ci, t in enumerate(taps):
        pcol = pos_yx[:, :, lo:lo + t]
        lo += t
        outs['cls'].append(_fused_impl(cls_feat, pcol, w_cls[ci]))
        outs['pts'].append(_fused_impl(pts_feat, pcol, w_pts[ci]))
    return (jnp.concatenate(outs['cls'], axis=-1),
            jnp.concatenate(outs['pts'], axis=-1))


def _col_contract(col, w, P):
    """(col @ w) -> (B, P, F) for either column layout: plain (B, P, t, C)
    or the vw kernel's raw (B, n_pt, t, S, TP, LANE)."""
    if col.ndim == 4:
        return jnp.einsum('bpkc,kcf->bpf', col, w,
                          preferred_element_type=jnp.float32)
    B, n_pt, t, S = col.shape[:4]
    w6 = w.reshape(t, S, LANE, w.shape[-1])
    out = jnp.einsum('bnkstl,kslf->bntf', col, w6,
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, n_pt * TP, w.shape[-1])
    return out[:, :P]


def _columns_dual_fwd(cls_feat, pts_feat, pos_yx, w_cls, w_pts, taps):
    H, W, C = cls_feat.shape[1:]
    P = pos_yx.shape[1]
    if use_pallas_split(H, W, C, cls_feat.dtype.itemsize):
        # raw=True hands consumers the kernel's native 6-d layout, saving
        # one XLA copy — but the backward's weight-grad matmul then pays
        # an implicit relayout of the same bytes that measures ~5 ms at
        # the cascade concat83 shape, vs ~2 ms for one explicit transpose.
        # KGDET_DUAL_RAW: '1' raw everywhere, '0' transpose before the
        # contraction, 'res' (default) contract raw but store the residual
        # transposed so only the bwd weight-grad consumer is standard
        # (A/B: tools/profile_deform_variants.py --dual-only --grad)
        cols = deform_sample_split_pallas(cls_feat, pts_feat, pos_yx, taps,
                                          raw=_dual_raw_mode() != '0')
    else:
        cols = _split_xla(cls_feat, pts_feat, pos_yx, taps)
    dt = cls_feat.dtype
    cls_cat = jnp.concatenate([
        _col_contract(c, w_cls[i].astype(dt), P).astype(dt)
        for i, (c, _) in enumerate(cols)], axis=-1)
    kpt_cat = jnp.concatenate([
        _col_contract(p, w_pts[i].astype(dt), P).astype(dt)
        for i, (_, p) in enumerate(cols)], axis=-1)
    if cols and cols[0][0].ndim == 6 and _dual_raw_mode() == 'res':
        cols = tuple(tuple(_raw_to_std(c, P) for c in pair)
                     for pair in cols)
    return (cls_cat, kpt_cat), (cols, cls_feat, pts_feat, pos_yx,
                                w_cls, w_pts)


def _dual_raw_mode():
    import os
    return os.environ.get('KGDET_DUAL_RAW', 'res')


def _raw_to_std(col, P):
    """(B, n_pt, t, S, TP, LANE) raw column -> standard (B, P, t, C)."""
    B, n_pt, t, S = col.shape[:4]
    return col.transpose(0, 1, 4, 2, 3, 5).reshape(
        B, n_pt * TP, t, S * LANE)[:, :P]


def _col_weight_grad(col, g):
    """d(col @ w)/dw -> (t, C, F) for either column layout (g: (B, P, F))."""
    if col.ndim == 4:
        return jnp.einsum('bpkc,bpf->kcf', col, g,
                          preferred_element_type=jnp.float32)
    B, n_pt, t, S = col.shape[:4]
    P = g.shape[1]
    # contracting (b, n, TP) directly on the raw layout puts the reduction
    # dims at positions 0/1/4 — XLA's internal transpose for that matmul
    # measured ~4x the cost of doing the mid-dim permutation explicitly
    # (lane dim untouched, contiguous 128-lane rows move) and contracting
    # in the standard (B, P, t, C) layout
    col_t = col.transpose(0, 1, 4, 2, 3, 5).reshape(
        B, n_pt * TP, t, S * LANE)[:, :P]
    return jnp.einsum('bpkc,bpf->kcf', col_t, g,
                      preferred_element_type=jnp.float32)


def _columns_dual_bwd(taps, res, g):
    cols, cls_feat, pts_feat, pos_yx, w_cls, w_pts = res
    g_cls, g_pts = g
    C = cls_feat.shape[-1]
    F = w_cls[0].shape[-1]
    gw_cls, gw_pts, g_full = [], [], []
    for ci, t in enumerate(taps):
        gc = g_cls[..., ci * F:(ci + 1) * F].astype(jnp.float32)
        gp = g_pts[..., ci * F:(ci + 1) * F].astype(jnp.float32)
        col_c, col_p = cols[ci]
        gw_cls.append(_col_weight_grad(col_c, gc).astype(w_cls[ci].dtype))
        gw_pts.append(_col_weight_grad(col_p, gp).astype(w_pts[ci].dtype))
        gcol_c = jnp.einsum('bpf,kcf->bpkc', gc,
                            w_cls[ci].astype(jnp.float32))
        gcol_p = jnp.einsum('bpf,kcf->bpkc', gp,
                            w_pts[ci].astype(jnp.float32))
        g_full.append(jnp.concatenate([gcol_c, gcol_p], axis=-1)
                      .astype(cls_feat.dtype))
    g_all = jnp.concatenate(g_full, axis=2)          # (B, P, K, 2C)
    cat = jnp.concatenate([cls_feat, pts_feat], axis=-1)
    H, W, C2 = cat.shape[1:]
    if use_pallas_split(H, W, C, cls_feat.dtype.itemsize):
        grad_cat, grad_pos = _deform_bwd_pallas(cat, pos_yx, g_all)
    else:
        from kgdet_tpu.ops.deform import bilinear_gather
        _, vjp = jax.vjp(bilinear_gather, cat, pos_yx)
        grad_cat, grad_pos = vjp(g_all)
    return (grad_cat[..., :C], grad_cat[..., C:], grad_pos,
            tuple(gw_cls), tuple(gw_pts))


deform_columns_dual.defvjp(_columns_dual_fwd, _columns_dual_bwd)


def use_pallas_split(H, W, C, itemsize):
    """Gate for the shared split gather over the cls|pts concat."""
    import os
    if os.environ.get('KGDET_DISABLE_PALLAS'):
        return False
    if C % LANE:
        return False
    S = 2 * C // LANE
    st = slice_tiles(H * W, S, itemsize)
    if st is None or st != S:
        return False
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:
        return False


def _axis_weights_bwd(c0c, c0i, frac):
    """Per-slot lerp weight and its exact coordinate derivative ({-1, 0, +1}
    by the clamp-match cases — the CUDA col2im_coord boundary semantics,
    deform_conv_cuda_kernel.cu:145-188)."""
    ws, ds = [], []
    for slot in (0, 1):
        cc = c0c + slot
        ws.append(jnp.where(cc == c0i, 1.0 - frac,
                            jnp.where(cc == c0i + 1, frac, 0.0)))
        ds.append(jnp.where(cc == c0i, -1.0,
                            jnp.where(cc == c0i + 1, 1.0, 0.0)))
    return ws, ds


def _prep_indices_bwd(pos_yx, H, W):
    """Row starts + per-axis weights and coordinate derivatives.

    Returns starts (B, P, K, 2) int32 and wd8 (B, P, K, 8) f32 laid out
    (wy0, wy1, wx0, wx1, dwy0, dwy1, dwx0, dwx1). The d-entries are the
    exact derivative of each loaded slot's weight wrt the coordinate
    ({-1, 0, +1} by the clamp-match cases), so out-of-bounds corners
    contribute nothing to either gradient — the CUDA col2im_coord
    boundary semantics (deform_conv_cuda_kernel.cu:145-188).
    """
    pos_dtype = jnp.promote_types(pos_yx.dtype, jnp.float32)
    y = pos_yx[..., 0].astype(pos_dtype)
    x = pos_yx[..., 1].astype(pos_dtype)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    dy = y - y0
    dx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0c = jnp.clip(y0i, 0, max(H - 2, 0))
    x0c = jnp.clip(x0i, 0, max(W - 2, 0))

    wy, dwy = _axis_weights_bwd(y0c, y0i, dy)
    wx, dwx = _axis_weights_bwd(x0c, x0i, dx)
    wd8 = jnp.stack([wy[0], wy[1], wx[0], wx[1],
                     dwy[0], dwy[1], dwx[0], dwx[1]],
                    axis=-1).astype(jnp.float32)
    starts = jnp.stack([y0c * W + x0c, (y0c + 1) * W + x0c], axis=-1)
    return starts, wd8


def _prep_indices_bwd_vw(pos_yx, H, W):
    """Backward prep for the vector-weight walk: per-corner coefficient
    triplets in the PAIRED load order (tl, bl, tr, br).

    Returns starts (B, P, K, 2) int32 and wd12 (B, P, K, 12) f32 laid out
    [w4 | u4 | v4]: w4 the feat-grad lerp weights (w_c so that
    gfeat[corner_c] += w_c * g), u4 the d(sample)/dy per-corner coefs,
    v4 the d(sample)/dx coefs — so gy = sum_c u_c * <g, corner_c> and
    gx = sum_c v_c * <g, corner_c>, with out-of-bounds corners zeroed by
    the same clamp-match cases as _prep_indices_bwd."""
    pos_dtype = jnp.promote_types(pos_yx.dtype, jnp.float32)
    y = pos_yx[..., 0].astype(pos_dtype)
    x = pos_yx[..., 1].astype(pos_dtype)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y0c = jnp.clip(y0i, 0, max(H - 2, 0))
    x0c = jnp.clip(x0i, 0, max(W - 2, 0))
    wy, dwy = _axis_weights_bwd(y0c, y0i, y - y0)
    wx, dwx = _axis_weights_bwd(x0c, x0i, x - x0)
    # paired corner order: (tl, bl, tr, br) = (y0x0, y1x0, y0x1, y1x1)
    wd12 = jnp.stack([
        wy[0] * wx[0], wy[1] * wx[0], wy[0] * wx[1], wy[1] * wx[1],
        dwy[0] * wx[0], dwy[1] * wx[0], dwy[0] * wx[1], dwy[1] * wx[1],
        wy[0] * dwx[0], wy[1] * dwx[0], wy[0] * dwx[1], wy[1] * dwx[1],
    ], axis=-1).astype(jnp.float32)
    starts = jnp.stack([y0c * W + x0c, (y0c + 1) * W + x0c], axis=-1)
    return starts, wd12


def _bwd_kernel(starts_ref, wd_ref, g_ref, feat_ref, gfeat_ref, gpos_ref,
                *, K):
    """One (b, p-tile) step of the fused backward over one channel slab.

    Feature gradient: w_ij * g scatter-accumulated into gfeat_ref, whose
    block index is constant over the inner p-tile grid dim — Mosaic keeps
    it resident (zeroed at the first tile, flushed when the batch moves).
    Position gradient: the four corner rows are already VMEM-resident, so
    the kernel forms the analytic d(sample)/dy and d(sample)/dx vectors
    and reduces them against the cotangent to per-tap scalars (partial
    over this channel slab; XLA sums slabs).
    """
    pt = pl.program_id(1)

    @pl.when(pt == 0)
    def _():
        gfeat_ref[...] = jnp.zeros(gfeat_ref.shape, gfeat_ref.dtype)

    def body(p, _):
        for k in range(K):
            r0 = starts_ref[0, 0, p, 2 * k]
            r1 = starts_ref[0, 0, p, 2 * k + 1]
            wy0 = wd_ref[0, 0, p, 8 * k + 0]
            wy1 = wd_ref[0, 0, p, 8 * k + 1]
            wx0 = wd_ref[0, 0, p, 8 * k + 2]
            wx1 = wd_ref[0, 0, p, 8 * k + 3]
            dy0 = wd_ref[0, 0, p, 8 * k + 4]
            dy1 = wd_ref[0, 0, p, 8 * k + 5]
            dx0 = wd_ref[0, 0, p, 8 * k + 6]
            dx1 = wd_ref[0, 0, p, 8 * k + 7]
            g = g_ref[0, p, k].astype(jnp.float32)       # (st, LANE)
            top = feat_ref[0, pl.ds(r0, 2)]
            bot = feat_ref[0, pl.ds(r1, 2)]
            t0 = top[0].astype(jnp.float32)
            t1 = top[1].astype(jnp.float32)
            b0 = bot[0].astype(jnp.float32)
            b1 = bot[1].astype(jnp.float32)
            # feature gradient: read-modify-write the two row pairs
            gt = gfeat_ref[0, pl.ds(r0, 2)]
            gfeat_ref[0, pl.ds(r0, 2)] = gt + jnp.stack(
                [g * (wy0 * wx0), g * (wy0 * wx1)])
            gb = gfeat_ref[0, pl.ds(r1, 2)]
            gfeat_ref[0, pl.ds(r1, 2)] = gb + jnp.stack(
                [g * (wy1 * wx0), g * (wy1 * wx1)])
            # position gradient partials for this channel slice
            gy_vec = dy0 * (wx0 * t0 + wx1 * t1) \
                + dy1 * (wx0 * b0 + wx1 * b1)
            gx_vec = wy0 * (dx0 * t0 + dx1 * t1) \
                + wy1 * (dx0 * b0 + dx1 * b1)
            gpos_ref[0, 0, p, 2 * k] = jnp.sum(g * gy_vec)
            gpos_ref[0, 0, p, 2 * k + 1] = jnp.sum(g * gx_vec)
        return 0

    lax.fori_loop(0, TP, body, 0)


def _bwd_kernel_v2(starts_ref, wd_ref, g_ref, feat_ref, gfeat_ref, gpos_ref,
                   scratch_ref, *, K, st):
    """Backward step with MXU-free but *batched* position-grad reduction.

    The v1 kernel reduced g*dpos to a scalar per (pixel, tap) — two
    128-lane cross-lane reductions plus two scalar SMEM stores per tap,
    which dominated the inner loop. Here the per-tap product vectors are
    staged into a VMEM scratch laid out (2*st, TP, K*LANE) in sublane-
    aligned 8-pixel groups (the _fused_kernel store trick), and ONE
    batched reduction at the end of the grid step collapses them to
    (2, TP, K): the lane-dim reduce is lowered once over full vregs
    instead of per tap. The feature-gradient scatter (read-modify-write
    into the VMEM-resident slab) is unchanged.
    """
    pt = pl.program_id(1)

    @pl.when(pt == 0)
    def _():
        gfeat_ref[...] = jnp.zeros(gfeat_ref.shape, gfeat_ref.dtype)

    def body(pg, _):
        base = pg * 8
        for k in range(K):
            prods_y, prods_x = [], []
            for pr in range(8):
                p = base + pr
                r0 = starts_ref[0, 0, p, 2 * k]
                r1 = starts_ref[0, 0, p, 2 * k + 1]
                wy0 = wd_ref[0, 0, p, 8 * k + 0]
                wy1 = wd_ref[0, 0, p, 8 * k + 1]
                wx0 = wd_ref[0, 0, p, 8 * k + 2]
                wx1 = wd_ref[0, 0, p, 8 * k + 3]
                dy0 = wd_ref[0, 0, p, 8 * k + 4]
                dy1 = wd_ref[0, 0, p, 8 * k + 5]
                dx0 = wd_ref[0, 0, p, 8 * k + 6]
                dx1 = wd_ref[0, 0, p, 8 * k + 7]
                g = g_ref[0, p, k].astype(jnp.float32)   # (st, LANE)
                top = feat_ref[0, pl.ds(r0, 2)]
                bot = feat_ref[0, pl.ds(r1, 2)]
                t0 = top[0].astype(jnp.float32)
                t1 = top[1].astype(jnp.float32)
                b0 = bot[0].astype(jnp.float32)
                b1 = bot[1].astype(jnp.float32)
                gt = gfeat_ref[0, pl.ds(r0, 2)]
                gfeat_ref[0, pl.ds(r0, 2)] = gt + jnp.stack(
                    [g * (wy0 * wx0), g * (wy0 * wx1)])
                gb = gfeat_ref[0, pl.ds(r1, 2)]
                gfeat_ref[0, pl.ds(r1, 2)] = gb + jnp.stack(
                    [g * (wy1 * wx0), g * (wy1 * wx1)])
                gy_vec = dy0 * (wx0 * t0 + wx1 * t1) \
                    + dy1 * (wx0 * b0 + wx1 * b1)
                gx_vec = wy0 * (dx0 * t0 + dx1 * t1) \
                    + wy1 * (dx0 * b0 + dx1 * b1)
                prods_y.append(g * gy_vec)
                prods_x.append(g * gx_vec)
            ty = jnp.stack(prods_y)                      # (8, st, LANE)
            tx = jnp.stack(prods_x)
            for s in range(st):
                scratch_ref[s, pl.ds(base, 8),
                            pl.ds(k * LANE, LANE)] = ty[:, s, :]
                scratch_ref[st + s, pl.ds(base, 8),
                            pl.ds(k * LANE, LANE)] = tx[:, s, :]
        return 0

    lax.fori_loop(0, TP // 8, body, 0)
    accy = scratch_ref[0]                                # (TP, K*LANE)
    accx = scratch_ref[st]
    for s in range(1, st):
        accy = accy + scratch_ref[s]
        accx = accx + scratch_ref[st + s]
    gy = accy.reshape(TP, K, LANE).sum(axis=-1)          # (TP, K)
    gx = accx.reshape(TP, K, LANE).sum(axis=-1)
    gpos_ref[0, 0, 0] = gy
    gpos_ref[0, 0, 1] = gx


def _bwd_kernel_vw(starts_ref, w4_ref, wd_ref, g_ref, feat_ref, gfeat_ref,
                   gpos_ref, scratch_ref, *, K, st, paired_gfeat):
    """Backward step with the forward's round-4 treatment (round-5): the
    feature slab is ROW-PAIRED so one ds(r0, 2) load fetches all four
    bilinear corners, and the position-gradient walk runs at full vreg
    width over sublane groups of 8 pixels with VECTOR weights — per-corner
    coefficient triplets (w, u, v) arrive as a VMEM (8, 12) slice per
    (group, tap) instead of 8 scalar SMEM reads per (pixel, tap), and
    gy/gx product tiles are four full-width segment multiplies against
    (8, 1) weight columns (gy = sum_c u_c * <g, corner_c>).

    The feature-gradient scatter stays per-pixel (rows differ per pixel)
    but with paired_gfeat accumulates into a ROW-PAIRED gradient slab —
    ONE (2, 2, st, LANE) read-modify-write per (pixel, tap) instead of
    two — unpaired in XLA afterwards (real[r] = out[r, 0] + out[r-W, 1]).
    Scatter weights come from a small SMEM w4 block (scalar-pipeline
    native). The batched end-of-step lane reduction is v2's. Runs on a
    (n_pt,) grid, one pallas_call per batch element (b closed into the
    index maps — a grid-b-varying slab would be double-buffered).
    """
    pt = pl.program_id(0)

    @pl.when(pt == 0)
    def _():
        gfeat_ref[...] = jnp.zeros(gfeat_ref.shape, gfeat_ref.dtype)

    SL = st * LANE

    def body(pg, _):
        base = pg * 8
        for k in range(K):
            # batched position-gradient walk over the 8-pixel group
            cs = []
            for pr in range(8):
                r0 = starts_ref[0, 0, base + pr, 2 * k]
                cs.append(feat_ref[0, pl.ds(r0, 2)])     # (2, 2, st, LANE)
            c = jnp.stack(cs).reshape(8, 4 * SL).astype(jnp.float32)
            g8 = g_ref[0, pl.ds(base, 8), k].astype(jnp.float32) \
                .reshape(8, SL)
            wt = wd_ref[0, 0, pl.ds(base, 8), 12 * k:12 * (k + 1)]  # (8,12)
            cy = (c[:, :SL] * wt[:, 4:5]
                  + c[:, SL:2 * SL] * wt[:, 5:6]
                  + c[:, 2 * SL:3 * SL] * wt[:, 6:7]
                  + c[:, 3 * SL:] * wt[:, 7:8])
            cx = (c[:, :SL] * wt[:, 8:9]
                  + c[:, SL:2 * SL] * wt[:, 9:10]
                  + c[:, 2 * SL:3 * SL] * wt[:, 10:11]
                  + c[:, 3 * SL:] * wt[:, 11:12])
            ty = g8 * cy
            tx = g8 * cx
            for s in range(st):
                scratch_ref[s, pl.ds(base, 8),
                            pl.ds(k * LANE, LANE)] = \
                    ty[:, s * LANE:(s + 1) * LANE]
                scratch_ref[st + s, pl.ds(base, 8),
                            pl.ds(k * LANE, LANE)] = \
                    tx[:, s * LANE:(s + 1) * LANE]
            # feature-gradient scatter (per pixel: target rows differ)
            for pr in range(8):
                p = base + pr
                r0 = starts_ref[0, 0, p, 2 * k]
                w_tl = w4_ref[0, 0, p, 4 * k]
                w_bl = w4_ref[0, 0, p, 4 * k + 1]
                w_tr = w4_ref[0, 0, p, 4 * k + 2]
                w_br = w4_ref[0, 0, p, 4 * k + 3]
                gp = g_ref[0, p, k].astype(jnp.float32)  # (st, LANE)
                if paired_gfeat:
                    blk = gfeat_ref[0, pl.ds(r0, 2)]     # (2, 2, st, LANE)
                    add = jnp.stack([jnp.stack([gp * w_tl, gp * w_bl]),
                                     jnp.stack([gp * w_tr, gp * w_br])])
                    gfeat_ref[0, pl.ds(r0, 2)] = blk + add
                else:
                    r1 = starts_ref[0, 0, p, 2 * k + 1]
                    gt = gfeat_ref[0, pl.ds(r0, 2)]
                    gfeat_ref[0, pl.ds(r0, 2)] = gt + jnp.stack(
                        [gp * w_tl, gp * w_tr])
                    gb = gfeat_ref[0, pl.ds(r1, 2)]
                    gfeat_ref[0, pl.ds(r1, 2)] = gb + jnp.stack(
                        [gp * w_bl, gp * w_br])
        return 0

    lax.fori_loop(0, TP // 8, body, 0)
    accy = scratch_ref[0]                                # (TP, K*LANE)
    accx = scratch_ref[st]
    for s in range(1, st):
        accy = accy + scratch_ref[s]
        accx = accx + scratch_ref[st + s]
    gpos_ref[0, 0, 0] = accy.reshape(TP, K, LANE).sum(axis=-1)
    gpos_ref[0, 0, 1] = accx.reshape(TP, K, LANE).sum(axis=-1)


# scoped-VMEM cap for the vw backward footprint; above it the kernel first
# drops the paired gradient slab, then shrinks the channel tile, then falls
# back to v2 entirely (the serial stride-8 shapes: the paired feature slab
# alone exceeds any budget at st=1)
VW_BWD_CAP = 40 * 1024 * 1024
VW_BWD_MARGIN = 8 * 1024 * 1024


def _vw_bwd_bytes(HW, st, K, feat_item, g_item, paired_gfeat):
    """Scoped-VMEM footprint of one vw-backward call. Counts the gradient
    OUTPUT arrays twice (once as the whole-array kernel block, once for
    XLA's stack allocation of the custom-call outputs — measured on chip:
    the production 83-tap shape exceeded the plain-sum estimate by ~2M).
    The matching pallas_call passes vmem_limit_bytes = this + margin, so
    the cap is a resident-set policy knob, not the hardware 16M default."""
    gfeat = (2 if paired_gfeat else 1) * HW * st * LANE * 4
    gpos = 2 * HW * K * 4          # (1, n_pt, 2, TP, K) whole array, P~HW
    return (2 * HW * st * LANE * feat_item                     # paired slab
            + 2 * gfeat + gpos                                 # block+stack
            + 2 * TP * K * st * LANE * g_item                  # g block x2
            + 2 * st * TP * K * LANE * 4                       # scratch
            + 3 * TP * K * 12 * 4)                             # wd12/w4/starts


def _deform_bwd_vw(feat, pos_yx, g):
    """vw-walk backward; returns None when even the smallest channel tile
    cannot hold the paired slab (caller falls back to the v2 kernel)."""
    B, H, W, C = feat.shape
    _, P, K, _ = pos_yx.shape
    S = C // LANE
    st = slice_tiles(H * W, S, feat.dtype.itemsize)
    if st is None:
        return None
    paired_gfeat = True

    def fits(s, pg):
        return _vw_bwd_bytes(H * W, s, K, feat.dtype.itemsize,
                             g.dtype.itemsize, pg) <= VW_BWD_CAP

    while st and not fits(st, paired_gfeat):
        if paired_gfeat and fits(st, False):
            paired_gfeat = False
            break
        st -= 1
        while st and S % st:
            st -= 1
    if not st:
        return None
    n_s = S // st

    starts, wd12 = _prep_indices_bwd_vw(pos_yx, H, W)
    P_pad = -(-P // TP) * TP
    if P_pad != P:
        pad = [(0, 0), (0, P_pad - P), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad)
        wd12 = jnp.pad(wd12, pad)
        g = jnp.pad(g, pad)
    n_pt = P_pad // TP
    starts_k = starts.reshape(B, n_pt, TP, K * 2)
    w4_k = wd12[..., :4].reshape(B, n_pt, TP, K * 4)
    wd_k = wd12.reshape(B, n_pt, TP, K * 12)
    feat_r = feat.reshape(B, H * W, S, LANE)
    g_r = g.reshape(B, P_pad, K, S, LANE)

    def run_slice(feat_slab, g_slab):
        # one call per batch element, b closed over in the index maps: a
        # grid-b-varying slab/gradient-slab block would be double-buffered
        # by Mosaic (the f32 83-tap parity shape then blows the 16M scoped
        # limit); invariant blocks stay single-buffered (see _fused_impl)
        gf_shape = (1, H * W, 2, st, LANE) if paired_gfeat \
            else (1, H * W, st, LANE)
        gf_spec = pl.BlockSpec(
            gf_shape,
            (lambda t: (0, 0, 0, 0, 0)) if paired_gfeat
            else (lambda t: (0, 0, 0, 0)),
            memory_space=pltpu.VMEM)
        paired_slab = pair_rows(feat_slab, W)
        gfs, gps = [], []
        for b in range(B):
            smem_idx = lambda t, b=b: (b, t, 0, 0)  # noqa: E731
            gf, gp = pl.pallas_call(
                functools.partial(_bwd_kernel_vw, K=K, st=st,
                                  paired_gfeat=paired_gfeat),
                grid=(n_pt,),
                in_specs=[
                    pl.BlockSpec((1, 1, TP, K * 2), smem_idx,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, TP, K * 4), smem_idx,
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, TP, K * 12), smem_idx,
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, TP, K, st, LANE),
                                 lambda t, b=b: (b, t, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H * W, 2, st, LANE),
                                 lambda t, b=b: (b, 0, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=(
                    jax.ShapeDtypeStruct(gf_shape, jnp.float32),
                    jax.ShapeDtypeStruct((1, n_pt, 2, TP, K), jnp.float32),
                ),
                out_specs=(
                    gf_spec,
                    pl.BlockSpec((1, 1, 2, TP, K),
                                 lambda t: (0, t, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ),
                scratch_shapes=[
                    pltpu.VMEM((2 * st, TP, K * LANE), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_vw_bwd_bytes(
                        H * W, st, K, feat.dtype.itemsize,
                        g.dtype.itemsize, paired_gfeat) + VW_BWD_MARGIN),
            )(starts_k, w4_k, wd_k, g_slab, paired_slab)
            gfs.append(gf)
            gps.append(gp)
        gf = jnp.concatenate(gfs, axis=0) if B > 1 else gfs[0]
        gp = jnp.concatenate(gps, axis=0) if B > 1 else gps[0]
        if paired_gfeat:
            # real[r] = out[r, 0] + out[r - W, 1]; rows past HW - W of the
            # pair slot are provably zero (y0c <= H-2), so the shift drops
            # nothing
            gf = gf[:, :, 0] + jnp.concatenate(
                [jnp.zeros_like(gf[:, :W, 1]), gf[:, :-W, 1]], axis=1)
        gp = gp.transpose(0, 1, 3, 4, 2).reshape(B, n_pt, TP, K * 2)
        return gf, gp

    if n_s == 1:
        gfeat, gpos = run_slice(feat_r, g_r)
    else:
        gfeats, gposs = [], []
        for s in range(n_s):
            gf, gp = run_slice(feat_r[:, :, s * st:(s + 1) * st],
                               g_r[:, :, :, s * st:(s + 1) * st])
            gfeats.append(gf)
            gposs.append(gp)
        gfeat = jnp.concatenate(gfeats, axis=2)
        gpos = sum(gposs)

    grad_feat = gfeat.reshape(B, H, W, C).astype(feat.dtype)
    grad_pos = gpos.reshape(B, P_pad, K, 2)[:, :P].astype(pos_yx.dtype)
    return grad_feat, grad_pos


def _deform_bwd_pallas(feat, pos_yx, g):
    """Pallas backward of bilinear sampling at absolute positions.

    feat: (B, H, W, C); pos_yx: (B, P, K, 2); g: (B, P, K, C) cotangent.
    Returns (grad_feat, grad_pos). Channel-tiled like the forward.
    KGDET_DEFORM_BWD selects the kernel generation: 'vw' (default; falls
    back to v2 when the paired slab cannot fit), 'v2', 'v1'.
    """
    import os
    mode = os.environ.get('KGDET_DEFORM_BWD', 'vw')
    if mode == 'vw':
        out = _deform_bwd_vw(feat, pos_yx, g)
        if out is not None:
            return out

    B, H, W, C = feat.shape
    _, P, K, _ = pos_yx.shape
    S = C // LANE
    st = slice_tiles(H * W, S, feat.dtype.itemsize)
    assert st is not None, feat.shape

    use_v1 = mode == 'v1'
    if not use_v1:
        # v2 keeps more scoped VMEM resident than the v1 budget accounts
        # for: the position-grad scratch (2*st, TP, K*LANE) f32 and the
        # double-buffered g block. Shrink the lane-slice count until the
        # whole footprint fits (the f32 83-tap parity shape OOMs at the
        # plain slice_tiles choice).
        def v2_bytes(s):
            return (H * W * s * LANE * feat.dtype.itemsize      # slab
                    + H * W * s * LANE * 4                       # gfeat out
                    + 2 * TP * K * s * LANE * g.dtype.itemsize   # g block x2
                    + 2 * s * TP * K * LANE * 4)                 # scratch
        while st > 1 and v2_bytes(st) > 13 * 1024 * 1024:
            st -= 1
            while S % st:
                st -= 1
        assert v2_bytes(st) <= 15 * 1024 * 1024, (feat.shape, K, st)
    n_s = S // st

    starts, wd8 = _prep_indices_bwd(pos_yx, H, W)
    P_pad = -(-P // TP) * TP
    if P_pad != P:
        pad = [(0, 0), (0, P_pad - P), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad)
        wd8 = jnp.pad(wd8, pad)
        g = jnp.pad(g, pad)
    n_pt = P_pad // TP
    starts_k = starts.reshape(B, n_pt, TP, K * 2)
    wd_k = wd8.reshape(B, n_pt, TP, K * 8)
    feat_r = feat.reshape(B, H * W, S, LANE)
    g_r = g.reshape(B, P_pad, K, S, LANE)

    def run_slice(feat_slab, g_slab):
        """Fused backward over one (B, HW, st, LANE) channel slab (one
        pallas_call per slab — see deform_sample_pallas.run_slice)."""
        common = dict(
            grid=(B, n_pt),
            in_specs=[
                pl.BlockSpec((1, 1, TP, K * 2), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, TP, K * 8), lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, TP, K, st, LANE),
                             lambda b, t: (b, t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H * W, st, LANE),
                             lambda b, t: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        if use_v1:
            return pl.pallas_call(
                functools.partial(_bwd_kernel, K=K),
                out_shape=(
                    jax.ShapeDtypeStruct((B, H * W, st, LANE), jnp.float32),
                    jax.ShapeDtypeStruct((B, n_pt, TP, K * 2), jnp.float32),
                ),
                out_specs=(
                    pl.BlockSpec((1, H * W, st, LANE),
                                 lambda b, t: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, TP, K * 2),
                                 lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.SMEM),
                ),
                **common,
            )(starts_k, wd_k, g_slab, feat_slab)
        gf, gp = pl.pallas_call(
            functools.partial(_bwd_kernel_v2, K=K, st=st),
            out_shape=(
                jax.ShapeDtypeStruct((B, H * W, st, LANE), jnp.float32),
                jax.ShapeDtypeStruct((B, n_pt, 2, TP, K), jnp.float32),
            ),
            out_specs=(
                pl.BlockSpec((1, H * W, st, LANE),
                             lambda b, t: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2, TP, K),
                             lambda b, t: (b, t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * st, TP, K * LANE), jnp.float32)],
            **common,
        )(starts_k, wd_k, g_slab, feat_slab)
        # (B, n_pt, 2, TP, K) -> (B, n_pt, TP, K, 2) -> v1's (.., TP, K*2)
        gp = gp.transpose(0, 1, 3, 4, 2).reshape(B, n_pt, TP, K * 2)
        return gf, gp

    if n_s == 1:
        gfeat, gpos = run_slice(feat_r, g_r)
    else:
        gfeats, gposs = [], []
        for s in range(n_s):
            gf, gp = run_slice(feat_r[:, :, s * st:(s + 1) * st],
                               g_r[:, :, :, s * st:(s + 1) * st])
            gfeats.append(gf)
            gposs.append(gp)
        gfeat = jnp.concatenate(gfeats, axis=2)
        gpos = sum(gposs)

    grad_feat = gfeat.reshape(B, H, W, C).astype(feat.dtype)
    grad_pos = gpos.reshape(B, P_pad, K, 2)[:, :P].astype(pos_yx.dtype)
    return grad_feat, grad_pos


def _split_xla(cls_feat, pts_feat, pos_yx, taps):
    """XLA reference of deform_sample_split_pallas (also the backward)."""
    from kgdet_tpu.ops.deform import bilinear_gather
    feat = jnp.concatenate([cls_feat, pts_feat], axis=-1)
    C = cls_feat.shape[-1]
    samples = bilinear_gather(feat, pos_yx)
    out = []
    lo = 0
    for t in taps:
        col = samples[:, :, lo:lo + t]
        lo += t
        out.append((col[..., :C], col[..., C:]))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def deform_sample_split(cls_feat, pts_feat, pos_yx, taps):
    """Column/branch-split deformable sampling (Pallas fwd, XLA bwd)."""
    return deform_sample_split_pallas(cls_feat, pts_feat, pos_yx, taps)


def _split_fwd(cls_feat, pts_feat, pos_yx, taps):
    return (deform_sample_split_pallas(cls_feat, pts_feat, pos_yx, taps),
            (cls_feat, pts_feat, pos_yx))


def _split_bwd(taps, res, g):
    """Pallas backward: reassemble the per-column cotangents into one
    (B, P, K, 2C) tensor, run the fused grad kernel, split channel grads."""
    cls_feat, pts_feat, pos_yx = res
    C = cls_feat.shape[-1]
    g_full = jnp.concatenate(
        [jnp.concatenate([gc, gp], axis=-1) for gc, gp in g], axis=2)
    cat = jnp.concatenate([cls_feat, pts_feat], axis=-1)
    grad_feat, grad_pos = _deform_bwd_pallas(cat, pos_yx, g_full)
    return grad_feat[..., :C], grad_feat[..., C:], grad_pos


deform_sample_split.defvjp(_split_fwd, _split_bwd)
