"""Native (C++) runtime components, bound via ctypes.

Built lazily with g++ on first use and cached next to the sources. Each
binding has a pure-Python capability check so the package still imports on
systems without a toolchain (features needing the library raise then).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, 'libtiler_native.so')
_SOURCES = ['lzma1.cc', 'dl3.cc', 'gtm_pack.cc']
_lock = threading.Lock()
_lib = None
_build_error: Exception | None = None


def _needs_build() -> bool:
    if not os.path.exists(_SO_PATH):
        return True
    so_mtime = os.path.getmtime(_SO_PATH)
    for src in _SOURCES:
        p = os.path.join(_DIR, src)
        if os.path.exists(p) and os.path.getmtime(p) > so_mtime:
            return True
    return False


def _build() -> None:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES
            if os.path.exists(os.path.join(_DIR, s))]
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           '-o', _SO_PATH] + srcs
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Returns the loaded ctypes library, building it if needed."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise _build_error
        try:
            if _needs_build():
                _build()
            lib = ctypes.CDLL(_SO_PATH)
        except Exception as e:  # noqa: BLE001
            _build_error = e
            raise
        lib.tiler_lzma_decode_alone.restype = ctypes.c_void_p
        lib.tiler_lzma_decode_alone.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_int)]
        lib.tiler_free.argtypes = [ctypes.c_void_p]
        lib.tiler_dl3_quant.restype = ctypes.c_int
        lib.tiler_dl3_quant.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
        _lib = lib
        return lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:  # noqa: BLE001
        return False


def lzma_decode_alone(data: bytes) -> tuple[bytes, int]:
    """Decode one LZMA-alone stream (any lc 0..8). Returns (out, consumed)."""
    lib = get_lib()
    out_len = ctypes.c_size_t()
    consumed = ctypes.c_size_t()
    status = ctypes.c_int()
    ptr = lib.tiler_lzma_decode_alone(data, len(data),
                                      ctypes.byref(out_len),
                                      ctypes.byref(consumed),
                                      ctypes.byref(status))
    if status.value != 0 or not ptr:
        raise ValueError(f'lzma decode failed (status {status.value})')
    try:
        out = ctypes.string_at(ptr, out_len.value)
    finally:
        lib.tiler_free(ptr)
    return out, consumed.value


def dl3_quant(pixels_rgb, quant_to: int, lookup_bpc: int):
    """Dennis Lee v3 palette from flat [M,3] uint8 pixels.

    Returns ([quant_to,3] uint8 palette, n_produced)."""
    import numpy as np
    lib = get_lib()
    px = np.ascontiguousarray(pixels_rgb, np.uint8)
    out = np.zeros((quant_to, 3), np.uint8)
    n = lib.tiler_dl3_quant(px.tobytes(), px.shape[0], quant_to, lookup_bpc,
                            out.ctypes.data_as(ctypes.c_void_p))
    return out, n


def lzma_decode_concat(data: bytes) -> bytes:
    """Decode concatenated LZMA-alone streams (GTM keyframe framing)."""
    out = []
    off = 0
    while off + 13 <= len(data):
        chunk, consumed = lzma_decode_alone(data[off:])
        out.append(chunk)
        if consumed == 0:
            break
        off += consumed
    return b''.join(out)
