"""ctypes bindings for the native host-IO library (native/vrt_io.cpp).

Provides multithreaded mmap parsing of .fvecs/.ivecs corpora and a
double-buffered prefetching stream reader. Every entry point has a NumPy
fallback so the framework works without the compiled library; callers use
:func:`available` / the ``prefer_native`` flags to pick.

Build: ``make -C native`` (g++, no external deps).
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Tuple

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libvrt_io.so"),
)

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    for path in _LIB_PATHS:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.vrt_read_fvecs.restype = ctypes.c_int
            lib.vrt_read_fvecs.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.vrt_read_ivecs.restype = ctypes.c_int
            lib.vrt_read_ivecs.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_long, ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.vrt_vecs_shape.restype = ctypes.c_int
            lib.vrt_vecs_shape.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.vrt_stream_open.restype = ctypes.c_void_p
            lib.vrt_stream_open.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ]
            lib.vrt_stream_next.restype = ctypes.c_long
            lib.vrt_stream_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.vrt_stream_close.restype = None
            lib.vrt_stream_close.argtypes = [ctypes.c_void_p]
            _lib = lib
            break
    return _lib


def available() -> bool:
    return _load() is not None


def vecs_shape(path: str) -> Tuple[int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    rows = ctypes.c_long()
    dim = ctypes.c_long()
    rc = lib.vrt_vecs_shape(path.encode(), ctypes.byref(rows), ctypes.byref(dim))
    if rc != 0:
        raise IOError(f"vrt_vecs_shape({path}) failed rc={rc}")
    return rows.value, dim.value


def read_fvecs(path: str, limit: Optional[int] = None) -> np.ndarray:
    """Native .fvecs parse; raises if the library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    rows, dim = vecs_shape(path)
    if limit is not None:
        rows = min(rows, limit)
    out = np.empty((rows, dim), dtype=np.float32)
    got_rows = ctypes.c_long()
    got_dim = ctypes.c_long()
    rc = lib.vrt_read_fvecs(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows,
        ctypes.byref(got_rows),
        ctypes.byref(got_dim),
    )
    if rc != 0:
        raise IOError(f"vrt_read_fvecs({path}) failed rc={rc}")
    return out[: got_rows.value]


def read_ivecs(path: str, limit: Optional[int] = None) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not built (make -C native)")
    rows, dim = vecs_shape(path)
    if limit is not None:
        rows = min(rows, limit)
    out = np.empty((rows, dim), dtype=np.int32)
    got_rows = ctypes.c_long()
    got_dim = ctypes.c_long()
    rc = lib.vrt_read_ivecs(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        rows,
        ctypes.byref(got_rows),
        ctypes.byref(got_dim),
    )
    if rc != 0:
        raise IOError(f"vrt_read_ivecs({path}) failed rc={rc}")
    return out[: got_rows.value]


def stream_chunks(
    path: str, chunk_bytes: int = 1 << 24, offset: int = 0
) -> Iterator[np.ndarray]:
    """Yield uint8 chunks of a binary file with background prefetch."""
    lib = _load()
    if lib is None:  # plain-Python fallback
        with open(path, "rb") as f:
            f.seek(offset)
            while True:
                data = f.read(chunk_bytes)
                if not data:
                    return
                yield np.frombuffer(data, dtype=np.uint8)
        return
    handle = lib.vrt_stream_open(path.encode(), offset, chunk_bytes)
    if not handle:
        raise IOError(f"vrt_stream_open({path}) failed")
    buf = np.empty(chunk_bytes, dtype=np.uint8)
    try:
        while True:
            n = lib.vrt_stream_next(
                handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
            )
            if n <= 0:
                return
            yield buf[:n].copy()
    finally:
        lib.vrt_stream_close(handle)
