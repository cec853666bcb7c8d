"""ctypes bindings for the native tile decoder (native/tile_decoder.cpp).

Builds libks_tiles.so on first use (g++, ~1s) and falls back to the cv2 path
transparently when the toolchain or libtiff is unavailable. The batch API
decodes a whole sample's 7-9 GeoTIFFs (or a whole batch's worth) in one call
on a C++ thread pool — the host-side fix for the reference's per-file
python-loop decode bottleneck (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False
_INIT_LOCK = threading.Lock()


def _build_and_load():
    """First call builds+loads the .so; thread-safe. Without the lock, the
    decode thread pool's first epoch races here: two g++ processes writing
    the same output file (CDLL of a truncated .so), and a thread seeing
    _TRIED=True mid-build with _LIB still None can latch the caller's
    'native disabled' fallback for the whole process."""
    global _LIB, _TRIED
    if _TRIED:  # fast path, safe: _TRIED only flips under the lock
        return _LIB
    with _INIT_LOCK:
        if _TRIED:
            return _LIB
        lib = _build_and_load_locked()
        _LIB = lib
        _TRIED = True
        return _LIB


def _build_and_load_locked():
    src = Path(__file__).resolve().parents[2] / "native" / "tile_decoder.cpp"
    so = Path(__file__).resolve().parents[2] / "native" / "libks_tiles.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            # compile to a temp name and rename (atomic on POSIX) so a
            # CONCURRENT PROCESS loading the path never sees a partial file
            tmp = so.with_suffix(f".so.tmp.{os.getpid()}")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", str(tmp), str(src),
                 "-ldl", "-lpthread"],
                check=True, capture_output=True,
            )
            tmp.replace(so)
        lib = ctypes.CDLL(str(so))
        lib.ks_available.restype = ctypes.c_int
        if not lib.ks_available():
            return None
        lib.ks_decode.restype = ctypes.c_int
        lib.ks_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ks_decode_batch.restype = None
        lib.ks_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        return lib
    except (subprocess.CalledProcessError, OSError):
        return None


def available() -> bool:
    return _build_and_load() is not None


def decode_tile(path: str, max_pixels: int = 1024 * 1024 * 4) -> np.ndarray:
    """Decode one GeoTIFF tile to float32 (H, W) or (H, W, C)."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native tile decoder unavailable")
    buf = np.empty(max_pixels, np.float32)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    c = ctypes.c_int32()
    rc = lib.ks_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, ctypes.byref(h), ctypes.byref(w), ctypes.byref(c),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    arr = buf[: h.value * w.value * c.value].reshape(h.value, w.value, c.value).copy()
    return arr[..., 0] if c.value == 1 else arr


def decode_batch(paths: list[str], tile_pixels: int = 224 * 224 * 4, threads: int = 0):
    """Decode many tiles concurrently; returns list of float32 arrays."""
    lib = _build_and_load()
    if lib is None:
        raise RuntimeError("native tile decoder unavailable")
    n = len(paths)
    out = np.empty((n, tile_pixels), np.float32)
    dims = np.zeros((n, 3), np.int32)
    rcs = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.ks_decode_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), tile_pixels,
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), threads,
    )
    results = []
    for i in range(n):
        if rcs[i] != 0:
            raise IOError(f"native decode failed ({rcs[i]}) for {paths[i]}")
        h, w, c = dims[i]
        a = out[i, : h * w * c].reshape(h, w, c).copy()
        results.append(a[..., 0] if c == 1 else a)
    return results
