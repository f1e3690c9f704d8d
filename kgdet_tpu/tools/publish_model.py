"""Publish a checkpoint: strip optimizer state, tag with a content hash.

Parity surface: reference tools/publish_model.py:16-25 (drop optimizer,
append sha256 prefix to the filename).

Usage:
  python -m kgdet_tpu.tools.publish_model work_dirs/x/checkpoints/1000 out_dir
"""
from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('checkpoint', help='Orbax train-state checkpoint path')
    p.add_argument('out_dir')
    args = p.parse_args()

    from kgdet_tpu.utils.checkpoint import load_params, save_params

    state = load_params(args.checkpoint)
    published = {'params': state['params'],
                 'batch_stats': state.get('batch_stats', {})}

    # content hash over the sorted flattened tensors
    import jax
    h = hashlib.sha256()
    flat, _ = jax.tree_util.tree_flatten_with_path(published)
    for path, leaf in sorted(flat, key=lambda kv: str(kv[0])):
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(leaf).tobytes())
    tag = h.hexdigest()[:8]

    out = os.path.join(args.out_dir, f'kgdet_model-{tag}')
    save_params(out, published)
    print(f'published {out} (sha256 {tag})')


if __name__ == '__main__':
    main()
