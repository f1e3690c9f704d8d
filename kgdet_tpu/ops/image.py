"""Device-side image normalization for uint8-shipped batches.

TPU-first data-path design: the host ships images as raw uint8 BGR (4x
less host->device traffic than normalized float32 — the transfer is the
dominant real-loop cost, see docs/design.md §9) and BGR->RGB, (x-mean)/std,
and padded-margin re-zeroing run on device, where XLA fuses them into the
first backbone conv's input read. The reference normalizes on the host
(mmdet/datasets/transforms.py ImageTransform:11-70) because torch dataloader
workers are plentiful there; on TPU the link is the scarce resource.

float32 inputs pass through untouched, so synthetic-batch tests and the
host-normalizing single-image API keep their exact semantics.
"""
from __future__ import annotations

import jax.numpy as jnp

from kgdet_tpu.data.deepfashion2_meta import IMG_MEAN, IMG_STD


def device_normalize(img, extents=None):
    """(B, H, W, 3) uint8 BGR -> normalized f32 RGB; other dtypes pass
    through. ``extents`` (B, 2) valid (h, w) re-zeroes the padded margin
    (parity with the host path, which zero-pads after normalizing)."""
    if img.dtype != jnp.uint8:
        return img
    x = img[..., ::-1].astype(jnp.float32)
    x = (x - jnp.asarray(IMG_MEAN)) / jnp.asarray(IMG_STD)
    if extents is not None:
        H, W = x.shape[1], x.shape[2]
        vh = extents[:, 0].astype(jnp.float32)
        vw = extents[:, 1].astype(jnp.float32)
        row = jnp.arange(H, dtype=jnp.float32)[None, :] < vh[:, None]
        col = jnp.arange(W, dtype=jnp.float32)[None, :] < vw[:, None]
        x = x * (row[:, :, None, None] & col[:, None, :, None])
    return x
