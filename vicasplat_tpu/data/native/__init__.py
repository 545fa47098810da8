"""Native (C++/libjpeg) batch JPEG decode for the input pipeline.

Lazily compiles jpeg_native.cpp into _jpeg_native.so with g++ on first use
(rebuilds when the source is newer) and binds it via ctypes. The foreign
call releases the GIL, so a single Python thread gets true multi-core
decode; `decode_jpegs_u8` in dataset_re10k.py uses this as the fast path
and keeps the PIL route as fallback (no toolchain, mixed frame sizes,
corrupt streams).

Role parity: the reference's decode runs inside torch's native DataLoader
workers (reference src/dataset/data_module.py:90-110); this is the
framework-owned equivalent.
"""
from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "jpeg_native.cpp"
_LIB_PATH = _DIR / "_jpeg_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        str(_SRC), "-o", str(_LIB_PATH), "-ljpeg", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Returns the bound library, building it if needed; None when
    unavailable (no g++/libjpeg — callers fall back to PIL)."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            fresh = (
                _LIB_PATH.exists()
                and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime
            )
            if not fresh and not _build():
                return None
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        lib.vs_jpeg_dims.restype = ctypes.c_int
        lib.vs_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.vs_decode_jpeg_batch.restype = ctypes.c_int
        lib.vs_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def decode_jpegs_u8_native(raw_list, n_threads: int = 0):
    """list of raw-JPEG byte buffers -> (V, H, W, 3) uint8, or None when
    the native path can't serve this batch (build failure, mixed sizes,
    corrupt stream — caller falls back to PIL)."""
    lib = load()
    if lib is None or not raw_list:
        return None
    # convert through the buffer protocol: bytes(torch_tensor) would
    # iterate PER BYTE via Tensor.unbind (measured 0.3 s/frame)
    bufs = [
        bytes(b) if isinstance(b, (bytes, bytearray, memoryview))
        else np.asarray(b, dtype=np.uint8).tobytes()
        for b in raw_list
    ]
    w0 = ctypes.c_int(0)
    h0 = ctypes.c_int(0)
    if lib.vs_jpeg_dims(bufs[0], len(bufs[0]), ctypes.byref(w0),
                        ctypes.byref(h0)) != 0:
        return None
    w, h = w0.value, h0.value
    n = len(bufs)
    for b in bufs[1:]:
        wi = ctypes.c_int(0)
        hi = ctypes.c_int(0)
        if (lib.vs_jpeg_dims(b, len(b), ctypes.byref(wi), ctypes.byref(hi))
                != 0 or wi.value != w or hi.value != h):
            return None
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    datas = (ctypes.c_char_p * n)(*bufs)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in bufs])
    rc = lib.vs_decode_jpeg_batch(
        datas, lens, n, out.ctypes.data_as(ctypes.c_void_p), w, h,
        int(n_threads),
    )
    if rc != 0:
        return None
    return out
