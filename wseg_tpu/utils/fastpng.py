"""Minimal fast palette-PNG encoder.

PIL's PNG save costs ~PIL overhead + zlib DEFLATE; on the single-core
hosts that front the TPU the 4 mask PNGs written per inference image
(reference infer_val.py TEST_ID writer matrix: no_crf + crf per
threshold) land on the e2e critical path.  Label masks are long runs of
equal bytes, for which an RLE-style deflate (distance-1 matches only)
is both much faster than DEFLATE level 1 and usually smaller.

Two tiers, same container (IHDR / PLTE / IDAT / IEND, filter-0 rows;
output decodes with any PNG reader):

* native/fastpng/libwseg_fastpng.so — single-pass fixed-Huffman RLE
  deflate in C (0.36 ms vs PIL's 2.5 ms for a 384x512 mask on the
  1-core v5e front-end host); built on demand with `make`.
* pure-Python fallback around one zlib Z_RLE deflate call (1.8 ms).

Used by engine/writers.py for mask outputs; PIL remains the reader and
the writer for RGB visualisations.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "fastpng")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwseg_fastpng.so")
_lib = None
_lib_tried = False
_lib_lock = threading.Lock()


def _load():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    with _lib_lock:
        if _lib is not None or _lib_tried:
            return _lib
        return _load_locked()


def _load_locked():
    global _lib, _lib_tried
    _lib_tried = True
    try:
        # always run make: it is a no-op when the .so is newer than the
        # source, and rebuilds if a stale binary shadows an edited
        # fastpng.c (writer threads serialise on _lib_lock, so no
        # overlapping builds)
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wseg_encode_indexed_png.restype = ctypes.c_long
        lib.wseg_encode_indexed_png.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        _lib = lib
    except Exception:  # pragma: no cover - toolchain missing
        _lib = None
    return _lib


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_indexed_png(mask: np.ndarray, palette) -> bytes:
    """Encode an (H, W) uint8 label map as an 8-bit palette PNG.

    Args:
      mask: (H, W) uint8 (values index the palette).
      palette: flat RGB list/array, length a multiple of 3 (<= 768).
    """
    if mask.dtype != np.uint8:
        mask = mask.astype(np.uint8)
    h, w = mask.shape
    lib = _load()
    if lib is not None:
        pal_a = np.ascontiguousarray(
            np.asarray(palette).reshape(-1), np.uint8)
        m = np.ascontiguousarray(mask)
        cap = h * (w + 1) * 2 + 4096
        out = np.empty(cap, np.uint8)
        n = lib.wseg_encode_indexed_png(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            pal_a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(pal_a),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
        if n > 0:
            return out[:n].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    pal = bytes(bytearray(palette))
    assert len(pal) % 3 == 0 and len(pal) <= 768, len(pal)
    # filter byte 0 in front of every scanline
    rows = np.empty((h, w + 1), np.uint8)
    rows[:, 0] = 0
    rows[:, 1:] = mask
    co = zlib.compressobj(1, zlib.DEFLATED, 15, 9, zlib.Z_RLE)
    idat = co.compress(rows.tobytes()) + co.flush()
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal)
            + _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))


def write_indexed_png(path: str, mask: np.ndarray, palette) -> None:
    with open(path, "wb") as f:
        f.write(encode_indexed_png(mask, palette))
