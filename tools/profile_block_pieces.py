"""Decompose the deform block's non-kernel (XLA-side) device time.

profile_hotspots: deform_block 9.7 ms device-busy; the three tap-walk
kernels are ~5.0. This times the XLA pieces around them, independently
jitted with distinct feeds:
  index_prep   grad_multiply + absolute_positions + _prep_indices + the
               pad/reshape into SMEM operand form (per branch-pair)
  pair_slabs   pair_rows on both 256-ch feature maps
  dense_tail   relu on the (B,P,3F) concats + cls/keypts/reppts Dense +
               NHWC reshapes

Usage (TPU): python tools/profile_block_pieces.py [--iters 6]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=6)
    args = p.parse_args()

    from trace_piece import device_time_ms

    from kgdet_tpu.models.kgdet_head import COLUMN_TAPS
    from kgdet_tpu.ops.deform import absolute_positions
    from kgdet_tpu.ops import pallas_deform as pd

    B, h, w, C = 8, 24, 42, 256
    K = sum(COLUMN_TAPS)
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    results = {}

    def report(name, fn, feeds):
        ms = device_time_ms(jax.jit(fn), feeds)
        results[name] = round(ms, 3)
        print(f'{name}: {ms:.3f} ms', flush=True)

    # ---- index prep: offsets -> absolute positions -> starts/w4 ----
    off_feeds = [(jnp.asarray((rng.randn(B, h, w, 2 * K) * 2)
                              .astype(np.float32)).astype(dtype),)
                 for _ in range(args.iters + 1)]

    def index_prep(rep):
        offs = rep.reshape(B, h, w, K, 2)
        pos = absolute_positions(offs, h, w)
        pos = pos.reshape(B, h * w, K, 2)
        starts, w4 = pd._prep_indices(pos, h, w)
        P_pad = -(-(h * w) // pd.TPF) * pd.TPF
        pad = [(0, 0), (0, P_pad - h * w), (0, 0), (0, 0)]
        starts = jnp.pad(starts, pad).reshape(B, -1, pd.TPF, K * 2)
        w4 = jnp.pad(w4, pad).reshape(B, -1, pd.TPF, K * 4)
        return jnp.sum(w4) + jnp.sum(starts)

    report('index_prep', index_prep, off_feeds)

    # ---- pair slabs: both feature maps ----
    feat_feeds = [(jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)
                               ).astype(dtype),
                   jnp.asarray(rng.randn(B, h, w, C).astype(np.float32)
                               ).astype(dtype))
                  for _ in range(args.iters + 1)]

    def pair_slabs(cf, pf):
        S = C // pd.LANE
        a = pd.pair_rows(cf.reshape(B, h * w, S, pd.LANE), w)
        b = pd.pair_rows(pf.reshape(B, h * w, S, pd.LANE), w)
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(
            b.astype(jnp.float32))

    report('pair_slabs', pair_slabs, feat_feeds)

    # ---- dense tail: relus + the three output Dense layers ----
    F = C
    P = -(-(h * w) // pd.TPF) * pd.TPF
    wc = jnp.asarray(rng.randn(3 * F, 13).astype(np.float32)).astype(dtype)
    wk = jnp.asarray(rng.randn(3 * F, 588).astype(np.float32)).astype(dtype)
    wr = jnp.asarray(rng.randn(588, 2 * K).astype(np.float32)).astype(dtype)
    cat_feeds = [(jnp.asarray(rng.randn(B, P, 3 * F).astype(np.float32)
                              ).astype(dtype),
                  jnp.asarray(rng.randn(B, P, 3 * F).astype(np.float32)
                              ).astype(dtype))
                 for _ in range(args.iters + 1)]

    def dense_tail(cls_cat, kpt_cat):
        cls_out = jnp.maximum(cls_cat, 0) @ wc
        kpt = jnp.maximum(kpt_cat, 0) @ wk
        rep = kpt @ wr
        outs = [t[:, :h * w].reshape(B, h, w, t.shape[-1])
                for t in (cls_out, kpt, rep)]
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    report('dense_tail', dense_tail, cat_feeds)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
