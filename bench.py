"""Benchmark: KGDet inference throughput (images/sec/chip) on real hardware.

Protocol mirrors the reference's tools/benchmark.py (batch-1-equivalent fps,
warmup then timed average, device-synchronized) but runs the whole pipeline —
forward + decode + NMS — on device at the canonical 750x1333-padded-to-/32
resolution. vs_baseline is against the mmdet-v1.x zoo proxy of 13.6 fps on a
V100 (reference MODEL_ZOO.md:59-66; the KGDet repo publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 13.6  # mmdetection v1.x R-50-FPN inference fps on 1x V100

# Self-validation (round-4 verdict task 1): the axon tunnel's wall clock can
# be satisfied without real execution (r03 recorded a physically impossible
# 19,665 img/s). Every timed mode now (a) folds a device-side checksum over
# every iteration's outputs and pulls that one scalar inside the timed
# region, (b) cross-checks wall-clock against xplane device-busy time, and
# (c) refuses to print a number that exceeds a compute-roofline bound.
INFER_ROOFLINE_FPS = 2000.0   # >2000 img/s @ b8 768x1344 R50+cascade is
                              # beyond one v5e's HBM/MXU roofline
TRAIN_ROOFLINE_IPS = 500.0


def _tree_checksum(outs):
    """Single f32 scalar folded over every leaf of every iteration's output;
    pulling it forces all iterations to have really executed."""
    tot = jnp.zeros((), jnp.float32)
    for leaf in jax.tree.leaves(outs):
        tot = tot + jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
    return tot


def _traced_busy_ms(call, feeds):
    """Median per-call device-busy ms from an xplane trace of 2 calls; None
    when no device plane is visible (e.g. CPU smoke runs) or tracing fails."""
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'tools'))
    try:
        from trace_piece import device_time_ms
        ms = device_time_ms(call, [(f,) for f in feeds[:3]])
        return ms if ms > 0 else None
    except Exception as e:  # tracing must never break the bench itself
        print(f'bench: trace cross-check unavailable: {e}', file=sys.stderr)
        return None


def emit_validated(metric, value, unit, baseline, checksum, wall_ms,
                   busy_ms, roofline):
    """Print the JSON line, or hard-fail (exit 2, no JSON) when the number
    is physically impossible: non-finite outputs, throughput above the
    roofline, or wall-clock faster than the device was busy."""
    problems = []
    if not np.isfinite(checksum):
        problems.append(f'non-finite output checksum {checksum}')
    if checksum <= 0.0:
        problems.append(
            f'output checksum {checksum} is not strictly positive — the '
            f'outputs are trivially zero (or never materialized), so the '
            f'timed loop proves nothing; bench configs must produce '
            f'non-empty detections (score_thr=0)')
    if value > roofline:
        problems.append(
            f'throughput {value:.1f} exceeds the {roofline:.0f} '
            f'roofline bound — wall clock did not measure real execution')
    if busy_ms is not None and wall_ms < 0.9 * busy_ms:
        problems.append(
            f'wall {wall_ms:.2f} ms/iter < device-busy {busy_ms:.2f} '
            f'ms/iter — impossible; the timed loop did not wait for the '
            f'device')
    if problems:
        print(json.dumps({'metric': metric, 'error': problems}),
              file=sys.stderr)
        sys.exit(2)
    print(json.dumps({
        'metric': metric,
        'value': round(value, 2),
        'unit': unit,
        'vs_baseline': round(value / baseline, 2),
        'checksum': float(checksum),
        'wall_ms_per_iter': round(wall_ms, 3),
        'device_busy_ms_per_iter':
            None if busy_ms is None else round(busy_ms, 3),
    }))


def kernel_check():
    """--check: compiled Mosaic kernel parity vs the XLA reference.

    Interpret-mode CI (tests/test_pallas_deform.py) can't catch a Mosaic
    lowering bug; this runs the Pallas deformable-sampling fwd+bwd on the
    real backend — the cascade hot shape (VMEM-resident) and the
    serial-head stride-8 shape (channel-tiled) — and compares outputs and
    both gradients against the XLA gather path. Prints one JSON line;
    exits nonzero on mismatch.
    """
    import kgdet_tpu.ops.pallas_deform as pd
    from kgdet_tpu.ops.deform import bilinear_gather

    rng = np.random.RandomState(0)
    results = {}

    def rel_err(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b) / (np.abs(b) + 1.0)))

    # 'tiled_exact' forces the channel-sliced path on a small f32 problem
    # (budget clamp) so the tiled Mosaic lowering is checked bit-tight;
    # 'serial_bf16' runs the production stride-8 bf16 shape, where the XLA
    # reference itself rounds its bilinear weights to bf16 (deform.py
    # bilinear_gather w4 cast), so only coarse agreement is meaningful.
    cases = {
        'hot_untiled': dict(B=2, H=24, W=42, C=512, K=83,
                            dtype=jnp.float32, tol=1e-3),
        'tiled_exact': dict(B=1, H=24, W=42, C=512, K=9,
                            dtype=jnp.float32, tol=1e-3, force_tile=True),
        'serial_bf16': dict(B=1, H=96, W=168, C=512, K=9,
                            dtype=jnp.bfloat16, tol=2e-2, loose_grads=True),
    }
    tols = {}
    saved = (pd.FWD_SLAB_BUDGET, pd.BWD_SLAB_BUDGET)
    for name, c in cases.items():
        P = c['H'] * c['W']
        feat = jnp.asarray(
            rng.randn(c['B'], c['H'], c['W'], c['C']).astype(
                np.float32)).astype(c['dtype'])
        pos = jnp.asarray(rng.uniform(
            -2, max(c['H'], c['W']) + 1,
            (c['B'], P, c['K'], 2)).astype(np.float32))
        g = jnp.asarray(
            rng.randn(c['B'], P, c['K'], c['C']).astype(
                np.float32)).astype(c['dtype'])
        if c.get('force_tile'):
            pd.FWD_SLAB_BUDGET = P * 128 * 4 + 64
            pd.BWD_SLAB_BUDGET = P * 128 * 8 + 64
        st = pd.slice_tiles(P, c['C'] // 128, feat.dtype.itemsize)
        if c.get('force_tile') or name == 'serial_bf16':
            assert st is not None and st < c['C'] // 128, (name, st)
        try:
            out_p, vjp_p = jax.vjp(pd.deform_sample_hybrid, feat, pos)
            out_x, vjp_x = jax.vjp(bilinear_gather, feat, pos)
            gf_p, gp_p = vjp_p(g)
            gf_x, gp_x = vjp_x(g)
        finally:
            pd.FWD_SLAB_BUDGET, pd.BWD_SLAB_BUDGET = saved
        results[f'{name}.fwd'] = rel_err(out_p, out_x)
        results[f'{name}.grad_feat'] = rel_err(gf_p, gf_x)
        results[f'{name}.grad_pos'] = rel_err(gp_p, gp_x)
        # bf16 grads: XLA ref rounds w4 to bf16, kernel keeps f32 weights;
        # interpret-mode probes show ~0.05-0.2 rel from that alone, so the
        # bf16 case only guards against catastrophic breakage (the
        # tiled_exact f32 case is the tight correctness gate)
        gtol = 0.5 if c.get('loose_grads') else c['tol']
        tols.update({f'{name}.fwd': c['tol'],
                     f'{name}.grad_feat': gtol,
                     f'{name}.grad_pos': gtol})

    # column/branch-split kernel on the cascade tap layout
    taps = (9, 25, 49)
    B, H, W, C = 1, 24, 42, 256
    P, K = H * W, sum(taps)
    cls_f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pts_f = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    pos = jnp.asarray(rng.uniform(-2, 44, (B, P, K, 2)).astype(np.float32))

    def loss(fn):
        def f(cf, pf, po):
            outs = fn(cf, pf, po, taps)
            return sum(jnp.sum(a ** 2) + jnp.sum(b ** 3) for a, b in outs)
        return f

    for (an, av), (bn, bv) in zip(
            zip(('grad_cls', 'grad_pts', 'grad_pos'),
                jax.grad(loss(pd.deform_sample_split), argnums=(0, 1, 2))(
                    cls_f, pts_f, pos)),
            zip(('grad_cls', 'grad_pts', 'grad_pos'),
                jax.grad(loss(pd._split_xla), argnums=(0, 1, 2))(
                    cls_f, pts_f, pos))):
        results[f'split.{an}'] = rel_err(av, bv)

    # fused gather+contract kernel (v3): compiled fwd + all three grads vs
    # the XLA gather+einsum reference on the cascade 9-tap column, both
    # sides forced to true-f32 matmuls (default TPU precision is one-pass
    # bf16 with side-dependent accumulation order; 'highest' makes 1e-3 a
    # real gate, and only the 9-tap f32 multi-pass fits scoped VMEM —
    # production runs bf16, where one-pass is exact for the inputs)
    w9 = jnp.asarray((rng.randn(9, C, C) * 0.05).astype(np.float32))
    pos9 = pos[:, :, :9]

    def floss(fn):
        return lambda f, p, w: jnp.sum(fn(f, p, w) ** 2)

    def fused_xla(f, p, w):
        from kgdet_tpu.ops.deform import bilinear_gather
        return jnp.einsum('bpkc,kcf->bpf', bilinear_gather(f, p), w,
                          preferred_element_type=jnp.float32)

    with jax.default_matmul_precision('highest'):
        fv = jax.grad(floss(pd.deform_conv_fused), argnums=(0, 1, 2))(
            cls_f, pos9, w9)
        xv = jax.grad(floss(fused_xla), argnums=(0, 1, 2))(cls_f, pos9, w9)
        of = pd.deform_conv_fused(cls_f, pos9, w9)
        ox = fused_xla(cls_f, pos9, w9)
    results['fused.fwd'] = rel_err(of, ox)
    for n, a, b in zip(('grad_feat', 'grad_pos', 'grad_w'), fv, xv):
        results[f'fused.{n}'] = rel_err(a, b)

    # dual path (v4): fused per-column primal + split-kernel vjp behind one
    # custom_vjp, on a reduced tap layout (the f32 per-column fused calls at
    # 25/49 taps exceed scoped VMEM; bf16 production shapes are exercised by
    # bench --train). Checks primal AND all five gradients vs XLA.
    dtaps = (4, 9)
    Kd = sum(dtaps)
    posd = pos[:, :, :Kd]
    w_cls = tuple(jnp.asarray((rng.randn(t, C, C) * 0.05).astype(np.float32))
                  for t in dtaps)
    w_pts = tuple(jnp.asarray((rng.randn(t, C, C) * 0.05).astype(np.float32))
                  for t in dtaps)

    def dual_xla(cf, pf, po, wc, wp):
        cols = pd._split_xla(cf, pf, po, dtaps)
        a = jnp.concatenate([
            jnp.einsum('bpkc,kcf->bpf', c, wc[i],
                       preferred_element_type=jnp.float32)
            for i, (c, _) in enumerate(cols)], axis=-1)
        b = jnp.concatenate([
            jnp.einsum('bpkc,kcf->bpf', p, wp[i],
                       preferred_element_type=jnp.float32)
            for i, (_, p) in enumerate(cols)], axis=-1)
        return a, b

    def dloss(fn):
        def f(cf, pf, po, wc, wp):
            a, b = fn(cf, pf, po, wc, wp)
            return jnp.sum(a ** 2) + jnp.sum(b ** 3)
        return f

    def dual_ours(cf, pf, po, wc, wp):
        return pd.deform_columns_dual(cf, pf, po, wc, wp, dtaps)

    with jax.default_matmul_precision('highest'):
        do = dual_ours(cls_f, pts_f, posd, w_cls, w_pts)
        dx = dual_xla(cls_f, pts_f, posd, w_cls, w_pts)
        dv = jax.grad(dloss(dual_ours), argnums=(0, 1, 2, 3, 4))(
            cls_f, pts_f, posd, w_cls, w_pts)
        xv2 = jax.grad(dloss(dual_xla), argnums=(0, 1, 2, 3, 4))(
            cls_f, pts_f, posd, w_cls, w_pts)
    results['dual.fwd'] = max(rel_err(do[0], dx[0]), rel_err(do[1], dx[1]))
    for n, a, b in zip(('grad_cls', 'grad_pts', 'grad_pos', 'grad_wc',
                        'grad_wp'), dv, xv2):
        results[f'dual.{n}'] = max(
            rel_err(x, y) for x, y in zip(jax.tree.leaves(a),
                                          jax.tree.leaves(b)))

    # round-5 fused tiers: clamp the fused budget so both the channel-tiled
    # ladder (st < S, f32 partial sums) and the hivmem full-paired kernel
    # (raised vmem_limit_bytes) lower through Mosaic on a small f32
    # problem; the production user is the serial stride-8 recipe
    # (bench --serial runs it at full shape)
    saved_fused = pd.FUSED_VMEM_BUDGET
    try:
        pd.FUSED_VMEM_BUDGET = 4 * 1024 * 1024   # st=1 fits, st=S doesn't
        assert pd._fused_paired_tile(P, C // 128, 9, C, 4) == 1, \
            'clamp no longer forces the tiled path'
        for tier in ('tiled', 'hivmem'):
            os.environ['KGDET_FUSED_TIER'] = tier
            with jax.default_matmul_precision('highest'):
                of_t = pd._fused_impl(cls_f, pos9, w9)
            results[f'fused_{tier}.fwd'] = rel_err(of_t, ox)
    finally:
        pd.FUSED_VMEM_BUDGET = saved_fused
        os.environ.pop('KGDET_FUSED_TIER', None)

    # transposed stem->maxpool->layer1 pipeline (ops/pallas_stem.py) vs the
    # shipped XLA path, at real layer1 channel dims; f32 is the tight gate,
    # bf16 runs a production-like extent (both sides compute in bf16 but
    # with different contraction orders, so only coarse agreement holds)
    from kgdet_tpu.models.layers import max_pool_3x3_s2
    from kgdet_tpu.models.resnet import s2d_stem_conv
    from kgdet_tpu.ops import pallas_stem as ps
    from kgdet_tpu.ops.pallas_resblock import bottleneck_reference

    # He-scaled weights keep activations O(1) through the 10-conv chain —
    # with unnormalized weights the magnitudes explode ~3x per conv and
    # relu-boundary flips at bf16 precision swamp the elementwise metric
    def he(*shape):
        fan = int(np.prod(shape[:-1]))
        return jnp.asarray(
            (rng.randn(*shape) * np.sqrt(2.0 / fan)).astype(np.float32))

    x32 = jnp.asarray(rng.randn(1, 192, 320, 3).astype(np.float32))
    sw = he(7, 7, 3, 64)
    sb = jnp.asarray((rng.randn(64) * .1).astype(np.float32))
    ws = []
    cin = 64
    for i in range(3):
        blk = dict(
            w1=he(cin, 64),
            b1=jnp.asarray((rng.randn(64) * .1).astype(np.float32)),
            w2=he(3, 3, 64, 64),
            b2=jnp.asarray((rng.randn(64) * .1).astype(np.float32)),
            w3=he(64, 256),
            b3=jnp.asarray((rng.randn(256) * .1).astype(np.float32)),
            wd=he(cin, 256) if i == 0 else None,
            bd=(jnp.asarray((rng.randn(256) * .1).astype(np.float32))
                if i == 0 else None))
        ws.append(blk)
        cin = 256
    blks = [ps.transpose_folded(b['w1'], b['b1'], b['w2'], b['b2'],
                                b['w3'], b['b3'], b['wd'], b['bd'])
            for b in ws]

    def xla_chain(dt):
        # cast back to dt after the f32 bias add so the chain stays
        # honestly bf16 like the pipeline's internals
        r = max_pool_3x3_s2(jnp.maximum(
            s2d_stem_conv(x32.astype(dt), sw) + sb, 0.0).astype(dt))
        for b in ws:
            r = bottleneck_reference(r, b['w1'], b['b1'], b['w2'],
                                     b['b2'], b['w3'], b['b3'],
                                     b['wd'], b['bd'])
        return r

    # f32 is the tight correctness gate, under 'highest' matmul precision
    # like the fused/dual cases above (default f32 matmuls decompose into
    # bf16 passes with shape/side-dependent accumulation order — measured
    # 1.4e-3 of pure precision noise at W4=80 with both kernels exact);
    # bf16 max-elementwise error through a 10-conv chain is dominated by
    # relu-boundary rounding flips, so it is gated as a NOISE RATIO vs
    # XLA's own bf16 error against the f32 oracle, plus a coarse
    # catastrophic bound
    with jax.default_matmul_precision('highest'):
        ref32 = xla_chain(jnp.float32)
        got32 = ps.stem_layer1_pipeline(x32, sw, sb, blks)
    results['stem_f32.pipeline'] = rel_err(got32, ref32)
    tols['stem_f32.pipeline'] = 1e-3

    o = np.asarray(ref32, np.float64)
    e_xla = np.abs(np.asarray(xla_chain(jnp.bfloat16), np.float64) - o) \
        / (np.abs(o) + 1.0)
    got16 = ps.stem_layer1_pipeline(x32.astype(jnp.bfloat16), sw, sb, blks)
    e_pipe = np.abs(np.asarray(got16, np.float64) - o) / (np.abs(o) + 1.0)
    results['stem_bf16.noise_vs_xla'] = float(
        e_pipe.mean() / max(e_xla.mean(), 1e-9))
    tols['stem_bf16.noise_vs_xla'] = 1.5
    results['stem_bf16.max_err'] = float(e_pipe.max())
    tols['stem_bf16.max_err'] = 0.5

    ok = all(v < tols.get(k, 1e-3) for k, v in results.items())
    print(json.dumps({
        'metric': 'pallas_kernel_check',
        'value': 1.0 if ok else 0.0,
        'unit': 'pass',
        'vs_baseline': 1.0 if ok else 0.0,
        'rel_errs': {k: round(v, 8) for k, v in results.items()},
    }))
    return ok


TRAIN_BASELINE_IPS = 5.7   # 0.353 s/iter on 8x V100 at 2 img/GPU
                           # (reference MODEL_ZOO.md:59-66) => img/s per GPU


def train_bench(batch=8):
    """--train: full KGDet train-step throughput (img/s/chip) at the given
    per-chip batch on the 768x1344 canvas."""
    import numpy as np

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import KGDetConfig
    from kgdet_tpu.parallel.train import make_optimizer, make_train_step

    cfg = KGDetConfig(compute_dtype='bfloat16')
    canvas = (768, 1344)
    model = build_model(cfg)
    variables = init_variables(model, cfg, canvas_hw=(64, 64))
    params, stats = variables['params'], variables['batch_stats']
    tx, _ = make_optimizer(cfg, params, steps_per_epoch=1000)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, canvas, tx),
                   donate_argnums=(0, 2))

    rng = np.random.RandomState(0)
    G, K = 16, cfg.head.num_keypts
    feeds = []
    for _ in range(8):
        boxes = np.zeros((batch, G, 4), np.float32)
        boxes[..., 2:] = rng.uniform(64, 400, (batch, G, 2))
        boxes[..., :2] = rng.uniform(0, 300, (batch, G, 2))
        boxes[..., 2:] += boxes[..., :2]
        kpts = rng.uniform(0, 700, (batch, G, K, 3)).astype(np.float32)
        kpts[..., 2] = 1
        feeds.append({
            'image': jnp.asarray(rng.randn(
                batch, canvas[0], canvas[1], 3).astype(np.float32)),
            'valid_hw': jnp.tile(jnp.asarray([[750, 1333]], jnp.int32),
                                 (batch, 1)),
            'gt_bboxes': jnp.asarray(boxes),
            'gt_labels': jnp.asarray(
                rng.randint(1, 14, (batch, G)).astype(np.int32)),
            'gt_kpts': jnp.asarray(kpts),
            'gt_mask': jnp.asarray(np.ones((batch, G), bool)),
        })
    jax.block_until_ready(feeds)

    params, opt_state, logs = step(params, stats, opt_state, feeds[0])
    jax.block_until_ready(logs['loss'])
    # checksum over the final params: each step consumes the previous
    # step's params, so pulling it forces the whole chain to have executed
    # (no xplane cross-check here: full train-step traces explode on this
    # host — see CLAUDE.md; the chain dependency is the execution proof)
    csum_fn = jax.jit(_tree_checksum)
    jax.block_until_ready(csum_fn(params))

    n_iters = 12
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, opt_state, logs = step(params, stats, opt_state,
                                       feeds[i % len(feeds)])
    csum = float(jax.device_get(csum_fn(params)))
    dt = time.perf_counter() - t0
    ips = n_iters * batch / dt
    emit_validated(f'kgdet_train_throughput_768x1344_b{batch}', ips,
                   'images/sec/chip', TRAIN_BASELINE_IPS, csum,
                   dt / n_iters * 1e3, None, TRAIN_ROOFLINE_IPS)


def serial_bench():
    """--serial: serial-head (5-level, stride-8..128) inference throughput
    — exercises the channel-tiled Pallas path on the stride-8/16 levels."""
    import numpy as np

    from kgdet_tpu.api import build_model, init_variables
    from kgdet_tpu.config import load_config

    cfg = load_config(
        'configs/reppoints_moment_serial_r50_fpn_1x_deepfashion2.py')
    # score_thr=0 keeps the checksum a real execution witness (see main())
    import dataclasses
    cfg = cfg.replace(compute_dtype='bfloat16',
                      test=dataclasses.replace(cfg.test, score_thr=0.0))
    from kgdet_tpu.api import make_predict_fn
    model = build_model(cfg)
    canvas = (768, 1344)
    batch = 4
    variables = init_variables(model, cfg, canvas_hw=(64, 64))
    predict = make_predict_fn(model, cfg, canvas)

    rng = np.random.RandomState(0)
    feeds = [{
        'image': jnp.asarray(rng.randn(
            batch, canvas[0], canvas[1], 3).astype(np.float32)),
        'img_hw': jnp.tile(jnp.array([[750, 1333]], jnp.float32),
                           (batch, 1)),
        'scale_factor': jnp.ones((batch,), jnp.float32),
    } for _ in range(10)]
    jax.block_until_ready(feeds)
    out = predict(variables, feeds[0])
    jax.block_until_ready(out)
    csum_fn = jax.jit(_tree_checksum)
    jax.block_until_ready(csum_fn([out] * len(feeds)))

    t0 = time.perf_counter()
    outs = [predict(variables, f) for f in feeds]
    csum = float(jax.device_get(csum_fn(outs)))
    dt = time.perf_counter() - t0

    busy_ms = _traced_busy_ms(lambda f: predict(variables, f), feeds)
    fps = len(feeds) * batch / dt
    emit_validated('serial_reppoints_inference_throughput_768x1344', fps,
                   'images/sec/chip', BASELINE_FPS, csum,
                   dt / len(feeds) * 1e3, busy_ms, INFER_ROOFLINE_FPS)


def main():
    from kgdet_tpu.api import build_model, init_variables, make_predict_fn
    from kgdet_tpu.config import KGDetConfig

    # score_thr=0: random-init logits sit below the focal-bias prior
    # (~0.01), so the default 0.05 threshold masks EVERY output to zero and
    # the execution-proving checksum would be trivially 0.0. Keeping all
    # fixed NMS slots populated costs no extra compute (thresholds are
    # masks over static shapes) and makes the checksum a real witness.
    import dataclasses
    cfg = KGDetConfig(compute_dtype='bfloat16')
    cfg = cfg.replace(test=dataclasses.replace(cfg.test, score_thr=0.0))
    model = build_model(cfg)
    canvas = (768, 1344)  # (1333, 800) keep-ratio resize padded to /32
    batch = 8

    variables = init_variables(model, cfg, canvas_hw=(64, 64))
    predict = make_predict_fn(model, cfg, canvas)

    rng = np.random.RandomState(0)
    # every iteration gets a DISTINCT pre-staged device feed: repeated
    # identical inputs can be memoized by remote-execution layers, and
    # per-iteration host transfers would measure the host link instead of
    # the chip
    n_iters = 20
    feeds = []
    for _ in range(n_iters):
        feeds.append({
            'image': jnp.asarray(rng.randn(
                batch, canvas[0], canvas[1], 3).astype(np.float32)),
            'img_hw': jnp.tile(
                jnp.array([[750, 1333]], jnp.float32), (batch, 1)),
            'scale_factor': jnp.ones((batch,), jnp.float32),
        })
    jax.block_until_ready(feeds)

    # warmup / compile (incl. the checksum program so the timed region
    # contains no compilation)
    out = predict(variables, feeds[0])
    jax.block_until_ready(out)
    csum_fn = jax.jit(_tree_checksum)
    jax.block_until_ready(csum_fn([out] * n_iters))

    t0 = time.perf_counter()
    outs = [predict(variables, f) for f in feeds]
    # the single scalar pull is the timed region's sync: it cannot resolve
    # until every iteration's outputs exist on device
    csum = float(jax.device_get(csum_fn(outs)))
    dt = time.perf_counter() - t0

    busy_ms = _traced_busy_ms(lambda f: predict(variables, f), feeds)
    fps = n_iters * batch / dt
    emit_validated('kgdet_inference_throughput_768x1344', fps,
                   'images/sec/chip', BASELINE_FPS, csum,
                   dt / n_iters * 1e3, busy_ms, INFER_ROOFLINE_FPS)


if __name__ == '__main__':
    if '--check' in sys.argv:
        sys.exit(0 if kernel_check() else 1)
    if '--all' in sys.argv:
        # one self-contained run: all four JSON lines (kernel parity,
        # inference, train, serial) — round-2 verdict task 10. Each mode
        # compiles its own programs; expect ~1h total on the axon tunnel.
        ok = kernel_check()
        main()
        train_bench()
        serial_bench()
        sys.exit(0 if ok else 1)
    if '--train' in sys.argv:
        b = int(sys.argv[sys.argv.index('--batch') + 1]) \
            if '--batch' in sys.argv else 8
        train_bench(batch=b)
    elif '--serial' in sys.argv:
        serial_bench()
    else:
        main()
