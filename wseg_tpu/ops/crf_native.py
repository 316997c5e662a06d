"""ctypes binding for the native permutohedral dense CRF.

The reference depends on pydensecrf (C++/Eigen, utils/dcrf.py); this
framework ships its own implementation (native/densecrf/) with the same
mean-field semantics — exact permutohedral bilateral filtering, unlike the
sparse-tap approximation in ops/crf.py.  Builds on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "densecrf")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwseg_densecrf.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.isfile(_LIB_PATH)
    except Exception as e:  # pragma: no cover
        print("native densecrf build failed:", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.wseg_densecrf_inference.restype = ctypes.c_int
    lib.wseg_densecrf_inference.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.wseg_permutohedral_filter.restype = ctypes.c_int
    lib.wseg_permutohedral_filter.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.wseg_permutohedral_build.restype = ctypes.c_void_p
    lib.wseg_permutohedral_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.wseg_permutohedral_export.restype = ctypes.c_int
    lib.wseg_permutohedral_export.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.wseg_permutohedral_free.restype = None
    lib.wseg_permutohedral_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def crf_inference_native(img: np.ndarray, probs: np.ndarray, t: int = 10,
                         scale_factor: float = 1.0, labels: int = 21,
                         sxy_gaussian: float = 3.0,
                         compat_gaussian: float = 3.0,
                         sxy_bilateral: float = 80.0, srgb: float = 13.0,
                         compat_bilateral: float = 10.0) -> np.ndarray:
    """Exact mean-field CRF; img (H,W,3) uint8, probs (H,W,C) float32."""
    lib = _load()
    if lib is None:
        from wseg_tpu.ops.crf import crf_inference_np
        return crf_inference_np(img, probs, t, scale_factor, labels,
                                sxy_gaussian, compat_gaussian,
                                sxy_bilateral, srgb, compat_bilateral)
    H, W, C = probs.shape
    img_c = np.ascontiguousarray(img, np.uint8)
    probs_c = np.ascontiguousarray(probs, np.float32)
    out = np.empty_like(probs_c)
    ret = lib.wseg_densecrf_inference(
        img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H, W, C,
        probs_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        int(t),
        float(sxy_gaussian / scale_factor), float(compat_gaussian),
        float(sxy_bilateral / scale_factor), float(srgb),
        float(compat_bilateral))
    assert ret == 0
    return out


def build_lattice_tables(features: np.ndarray):
    """Build the permutohedral lattice for ``features`` (N, d) float32 and
    export its splat/blur/slice tables (native/densecrf/densecrf.cc
    ``wseg_permutohedral_build/export``).

    Returns ``(offsets (N, d+1) int32, barycentric (N, d+1) float32,
    blur_neighbors (d+1, M, 2) int32, M)`` — missing neighbours are
    encoded as ``M`` (the zero slot).  These tables are fixed per image;
    the TPU mean-field path (ops/crf_lattice.py) uploads them once and
    runs every filter application on device.
    """
    lib = _load()
    assert lib is not None, "native densecrf unavailable"
    N, d = features.shape
    f = np.ascontiguousarray(features, np.float32)
    m_out = ctypes.c_int(0)
    handle = lib.wseg_permutohedral_build(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), d, N,
        ctypes.byref(m_out))
    assert handle, "lattice build failed"
    M = int(m_out.value)
    offsets = np.empty((N, d + 1), np.int32)
    bary = np.empty((N, d + 1), np.float32)
    nbr = np.empty((d + 1, M, 2), np.int32)
    try:
        ret = lib.wseg_permutohedral_export(
            handle,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            bary.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        assert ret == 0
    finally:
        lib.wseg_permutohedral_free(handle)
    return offsets, bary, nbr, M


def permutohedral_filter(features: np.ndarray,
                         values: np.ndarray) -> np.ndarray:
    """Raw lattice filter: features (N, d), values (N, C) -> (N, C)."""
    lib = _load()
    assert lib is not None, "native densecrf unavailable"
    N, d = features.shape
    _, C = values.shape
    f = np.ascontiguousarray(features, np.float32)
    v = np.ascontiguousarray(values, np.float32)
    out = np.empty_like(v)
    ret = lib.wseg_permutohedral_filter(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), d, N,
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), C,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    assert ret == 0
    return out
