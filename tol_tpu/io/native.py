"""ctypes bindings for the native runtime library (native/tolnative.cpp).

Provides the C++ host-side components (fast .param parsing, the binary
wind-grid cache that replaces the reference's MongoDB round trips, the
buffered telemetry logger) with a pure-Python fallback when the shared
library has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libtolnative.so")


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(path)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.tol_read_params.restype = ctypes.c_int
    lib.tol_read_params.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_double),
                                    ctypes.c_int]
    lib.tol_write_wind_grid.restype = ctypes.c_int
    lib.tol_read_wind_grid_header.restype = ctypes.c_int
    lib.tol_read_wind_grid_data.restype = ctypes.c_int
    lib.tol_logger_open.restype = ctypes.c_void_p
    lib.tol_logger_open.argtypes = [ctypes.c_char_p]
    lib.tol_logger_append.restype = ctypes.c_int
    lib.tol_logger_append.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                      ctypes.POINTER(ctypes.c_double),
                                      ctypes.c_uint32]
    lib.tol_logger_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def read_params_native(path: str) -> Optional[list]:
    """Native .param reader; None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    buf = (ctypes.c_double * 256)()
    n = lib.tol_read_params(path.encode(), buf, 256)
    if n < 0:
        raise IOError(f"tol_read_params failed for {path}")
    return [buf[i] for i in range(n)]


def write_wind_grid(path: str, origin, spacing, u, v, w) -> None:
    lib = load_library()
    u = np.ascontiguousarray(u, dtype=np.float32)
    v = np.ascontiguousarray(v, dtype=np.float32)
    w = np.ascontiguousarray(w, dtype=np.float32)
    nx, ny, nz = u.shape
    origin = np.ascontiguousarray(origin, dtype=np.float64)
    spacing = np.ascontiguousarray(spacing, dtype=np.float64)
    if lib is None:
        # Pure-Python fallback writes the same byte layout.
        with open(path, "wb") as f:
            f.write(b"TOLWGRID")
            f.write(np.array([1, nx, ny, nz], dtype=np.uint32).tobytes())
            f.write(origin.tobytes())
            f.write(spacing.tobytes())
            f.write(u.tobytes()); f.write(v.tobytes()); f.write(w.tobytes())
        return
    rc = lib.tol_write_wind_grid(
        path.encode(), nx, ny, nz,
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"tol_write_wind_grid failed for {path}")


def read_wind_grid(path: str):
    """Load a binary wind-grid cache -> WindGrid (jnp arrays).

    Replaces ``problem::cacheWind``'s Mongo queries (src/problem.cpp:371-469)
    with a single file read.
    """
    import jax.numpy as jnp

    from tol_tpu.models.wind import WindGrid

    lib = load_library()
    if lib is None:
        with open(path, "rb") as f:
            raw = f.read()
        assert raw[:8] == b"TOLWGRID"
        version, nx, ny, nz = np.frombuffer(raw[8:24], dtype=np.uint32)
        origin = np.frombuffer(raw[24:48], dtype=np.float64)
        spacing = np.frombuffer(raw[48:72], dtype=np.float64)
        cells = int(nx) * int(ny) * int(nz)
        off = 72
        u = np.frombuffer(raw[off:off + 4 * cells], dtype=np.float32)
        v = np.frombuffer(raw[off + 4 * cells:off + 8 * cells], dtype=np.float32)
        w = np.frombuffer(raw[off + 8 * cells:off + 12 * cells], dtype=np.float32)
    else:
        nx_, ny_, nz_ = (ctypes.c_uint32(), ctypes.c_uint32(), ctypes.c_uint32())
        origin = np.zeros(3); spacing = np.zeros(3)
        rc = lib.tol_read_wind_grid_header(
            path.encode(), ctypes.byref(nx_), ctypes.byref(ny_), ctypes.byref(nz_),
            origin.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc != 0:
            raise IOError(f"bad wind grid file {path}")
        nx, ny, nz = nx_.value, ny_.value, nz_.value
        cells = nx * ny * nz
        u = np.zeros(cells, dtype=np.float32)
        v = np.zeros(cells, dtype=np.float32)
        w = np.zeros(cells, dtype=np.float32)
        rc = lib.tol_read_wind_grid_data(
            path.encode(),
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IOError(f"bad wind grid data {path}")
    shape = (int(nx), int(ny), int(nz))
    return WindGrid(
        origin=jnp.asarray(origin), spacing=jnp.asarray(spacing),
        u=jnp.asarray(u.reshape(shape)), v=jnp.asarray(v.reshape(shape)),
        w=jnp.asarray(w.reshape(shape)),
        live=jnp.array([0.0, 1.0, 0.0]),
    )


class TelemetryLogger:
    """Buffered binary logger (the reference wrote text files from inside the
    SNOPT callback every iteration, src/DefineFG.cpp:16-46)."""

    def __init__(self, path: str):
        self._lib = load_library()
        self._handle = None
        self._pyfile = None
        if self._lib is not None:
            self._handle = self._lib.tol_logger_open(path.encode())
        if self._handle is None:
            self._pyfile = open(path, "wb")

    def append(self, tag: int, values) -> None:
        arr = np.ascontiguousarray(values, dtype=np.float64).ravel()
        if self._handle is not None:
            self._lib.tol_logger_append(
                self._handle, tag,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), arr.size)
        else:
            self._pyfile.write(np.array([tag, arr.size], dtype=np.uint32).tobytes())
            self._pyfile.write(arr.tobytes())

    def close(self) -> None:
        if self._handle is not None:
            self._lib.tol_logger_close(self._handle)
            self._handle = None
        if self._pyfile is not None:
            self._pyfile.close()
            self._pyfile = None


def read_telemetry(path: str):
    """Parse a telemetry log into [(tag, np.ndarray), ...]."""
    out = []
    with open(path, "rb") as f:
        raw = f.read()
    off = 0
    while off + 8 <= len(raw):
        tag, count = np.frombuffer(raw[off:off + 8], dtype=np.uint32)
        off += 8
        vals = np.frombuffer(raw[off:off + 8 * int(count)], dtype=np.float64)
        off += 8 * int(count)
        out.append((int(tag), vals))
    return out
