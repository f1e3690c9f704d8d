"""Native (C++) runtime components, loaded via ctypes.

maskops: RLE mask encode/decode/merge/area/iou/bbox/polygon — the COCO mask
backend (behavioral equivalent of the reference's pycocotools C core,
deepfashion2_api/common/maskApi.c). Compiled on first use with g++ -O3 and
cached next to the source.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'maskops.cpp')
_lock = threading.Lock()
_lib = None


def _so_path():
    # source hash in the artifact name: mtime ordering is not preserved by
    # git clones, so a stale binary could otherwise be loaded silently
    with open(_SRC, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f'_maskops_{digest}.so')


def _build(so):
    # pid-unique temp name: concurrent first-time builds (pytest-xdist,
    # parallel tools) must not interleave g++ output in one file
    tmp = f'{so}.{os.getpid()}.tmp'
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', _SRC, '-o', tmp]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, so)


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _so_path()
        if not os.path.exists(so):
            _build(so)
        lib = ctypes.CDLL(so)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.rle_encode.restype = ctypes.c_int
        lib.rle_encode.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u32p]
        lib.rle_decode.restype = ctypes.c_int
        lib.rle_decode.argtypes = [u32p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, u8p]
        lib.rle_area.restype = ctypes.c_uint64
        lib.rle_area.argtypes = [u32p, ctypes.c_int]
        lib.rle_to_bbox.restype = None
        lib.rle_to_bbox.argtypes = [u32p, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, dp]
        lib.rle_merge.restype = ctypes.c_int
        lib.rle_merge.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                                  ctypes.c_int, u32p]
        lib.rle_iou.restype = ctypes.c_double
        lib.rle_iou.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.rle_to_string.restype = ctypes.c_int
        lib.rle_to_string.argtypes = [u32p, ctypes.c_int, ctypes.c_char_p]
        lib.rle_from_string.restype = ctypes.c_int
        lib.rle_from_string.argtypes = [ctypes.c_char_p, ctypes.c_int, u32p]
        lib.poly_to_rle.restype = ctypes.c_int
        lib.poly_to_rle.argtypes = [dp, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, u32p]
        _lib = lib
        return lib


def _u32(a):
    return np.ascontiguousarray(a, dtype=np.uint32)


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


class RLE:
    """A run-length-encoded binary mask (column-major counts)."""

    __slots__ = ('h', 'w', 'counts')

    def __init__(self, h, w, counts):
        self.h = int(h)
        self.w = int(w)
        self.counts = _u32(counts)

    # -------------------------------------------------------- constructors
    @classmethod
    def encode(cls, mask: np.ndarray) -> 'RLE':
        """Encode an (h, w) binary mask."""
        lib = _load()
        h, w = mask.shape
        fmask = np.ascontiguousarray(
            np.asfortranarray(mask, dtype=np.uint8).reshape(-1, order='F'))
        out = np.empty(h * w + 1, np.uint32)
        m = lib.rle_encode(_ptr(fmask, ctypes.c_uint8), h, w,
                           _ptr(out, ctypes.c_uint32))
        return cls(h, w, out[:m])

    @classmethod
    def from_string(cls, s, h, w) -> 'RLE':
        lib = _load()
        if isinstance(s, str):
            s = s.encode()
        out = np.empty(len(s) + 1, np.uint32)
        m = lib.rle_from_string(s, len(s), _ptr(out, ctypes.c_uint32))
        return cls(h, w, out[:m])

    @classmethod
    def from_poly(cls, xy, h, w) -> 'RLE':
        lib = _load()
        xy = np.ascontiguousarray(xy, dtype=np.float64).reshape(-1)
        out = np.empty(h * w + 1, np.uint32)
        m = lib.poly_to_rle(_ptr(xy, ctypes.c_double), len(xy) // 2, h, w,
                            _ptr(out, ctypes.c_uint32))
        return cls(h, w, out[:m])

    # ------------------------------------------------------------- queries
    def decode(self) -> np.ndarray:
        lib = _load()
        out = np.zeros(self.h * self.w, np.uint8)
        rc = lib.rle_decode(_ptr(self.counts, ctypes.c_uint32),
                            len(self.counts), self.h, self.w,
                            _ptr(out, ctypes.c_uint8))
        if rc:
            raise ValueError('invalid RLE: counts do not cover h*w')
        return out.reshape(self.h, self.w, order='F')

    def area(self) -> int:
        lib = _load()
        return int(lib.rle_area(_ptr(self.counts, ctypes.c_uint32),
                                len(self.counts)))

    def to_bbox(self) -> np.ndarray:
        lib = _load()
        bb = np.zeros(4, np.float64)
        lib.rle_to_bbox(_ptr(self.counts, ctypes.c_uint32),
                        len(self.counts), self.h, self.w,
                        _ptr(bb, ctypes.c_double))
        return bb

    def to_string(self) -> bytes:
        lib = _load()
        buf = ctypes.create_string_buffer(6 * len(self.counts) + 1)
        n = lib.rle_to_string(_ptr(self.counts, ctypes.c_uint32),
                              len(self.counts), buf)
        return buf.raw[:n]

    def merge(self, other: 'RLE', intersect: bool = False) -> 'RLE':
        lib = _load()
        out = np.empty(self.h * self.w + 1, np.uint32)
        m = lib.rle_merge(
            _ptr(self.counts, ctypes.c_uint32), len(self.counts),
            _ptr(other.counts, ctypes.c_uint32), len(other.counts),
            1 if intersect else 0, _ptr(out, ctypes.c_uint32))
        return RLE(self.h, self.w, out[:m])

    def iou(self, other: 'RLE', iscrowd: bool = False) -> float:
        lib = _load()
        return float(lib.rle_iou(
            _ptr(self.counts, ctypes.c_uint32), len(self.counts),
            _ptr(other.counts, ctypes.c_uint32), len(other.counts),
            1 if iscrowd else 0, self.h, self.w))


def mask_iou_matrix(dts, gts, iscrowd=None):
    """IoU matrix between lists of RLEs (crowd GTs use IoF)."""
    iscrowd = iscrowd or [False] * len(gts)
    out = np.zeros((len(dts), len(gts)))
    for i, d in enumerate(dts):
        for j, g in enumerate(gts):
            out[i, j] = d.iou(g, iscrowd[j])
    return out
