"""ctypes bindings for the native C++ data-loading library.

Builds/loads ``native/libvlgae_io.so`` (see native/vlgae_io.cpp) and
exposes the batched det-feature packer. Falls back transparently to the
pure-NumPy :class:`vlgae_tpu.data.features.DetFeatureLoader` when the
library can't be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> Path:
    return Path(__file__).resolve().parents[2] / "native"


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _native_dir() / "libvlgae_io.so"
    if not so.exists() and build:
        try:
            subprocess.run(
                ["sh", str(_native_dir() / "build.sh")],
                check=True, capture_output=True, timeout=300,
            )
        except Exception:
            return None
    if not so.exists():
        return None
    lib = ctypes.CDLL(str(so))
    lib.vlgae_load_det_feats_batch.restype = ctypes.c_int
    lib.vlgae_load_det_feats_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vlgae_npy_header.restype = ctypes.c_int
    lib.vlgae_npy_header.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


def npy_shape(path) -> Optional[tuple]:
    lib = load_library()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    off = ctypes.c_int64()
    ds = ctypes.c_int()
    rc = lib.vlgae_npy_header(
        str(path).encode(), ctypes.byref(rows), ctypes.byref(cols),
        ctypes.byref(off), ctypes.byref(ds),
    )
    if rc != 0:
        return None
    return int(rows.value), int(cols.value)


def load_det_feats_batch(paths, pad_boxes: int, feat_dim: int,
                         sample: int, seed: int = 0):
    """Native batched det-feature packing. Returns (feats, boxes, mask)
    or None when the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    n = len(paths)
    feats = np.zeros((n, pad_boxes, feat_dim), np.float32)
    boxes = np.zeros((n, pad_boxes, 4), np.float32)
    mask = np.zeros((n, pad_boxes), np.uint8)
    joined = "\n".join(str(p) for p in paths).encode()
    rc = lib.vlgae_load_det_feats_batch(
        joined, n, pad_boxes, feat_dim, sample, seed,
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise OSError(f"vlgae_io batch load failed: rc={rc}")
    return feats, boxes, mask.astype(bool)
