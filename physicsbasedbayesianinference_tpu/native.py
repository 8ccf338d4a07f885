"""ctypes bindings for the native IO runtime (csrc/pbbi_io.cpp).

The shared library is compiled on first import with the system C++
toolchain (no build system, no pybind11 — a single ``c++ -O3 -shared``)
and cached next to the package. Every entry point has a pure-Python
fallback so the framework works on hosts without a compiler.

Capabilities:
  * :func:`parse_nbody_text` — fast parser for the reference's N-body IC
    format (reference samples/NBody/MiscFunctions.py:8-43).
  * :class:`SampleSink` / :func:`read_samples` — streaming binary sample
    store ([rows, dims] float32 + 32-byte header) so sample histories can
    exceed host RAM (the reference keeps everything in one ndarray,
    HMC.py:136-145 — impossible at 1e5 walkers).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(_PKG_DIR), "csrc", "pbbi_io.cpp")
_LIB_NAME = "_pbbi_io.so"

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _build_error
    for candidate_dir in (_PKG_DIR, tempfile.gettempdir()):
        lib_path = os.path.join(candidate_dir, _LIB_NAME)
        if os.path.exists(lib_path) and (
                not os.path.exists(_SRC)
                or os.path.getmtime(lib_path) >= os.path.getmtime(_SRC)):
            try:
                return ctypes.CDLL(lib_path)
            except OSError:
                pass
        if not os.path.exists(_SRC):
            continue
        for cc in ("c++", "g++", "cc"):
            try:
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", lib_path],
                    check=True, capture_output=True, timeout=120)
                return ctypes.CDLL(lib_path)
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired, OSError) as e:
                _build_error = f"{cc}: {e}"
                continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None (fallbacks active)."""
    global _lib
    if _lib is None:
        lib = _build_and_load()
        if lib is not None:
            lib.pbbi_nbody_header.restype = ctypes.c_long
            lib.pbbi_nbody_header.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double)]
            lib.pbbi_nbody_parse.restype = ctypes.c_int
            lib.pbbi_nbody_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double)]
            lib.pbbi_sink_open.restype = ctypes.c_void_p
            lib.pbbi_sink_open.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64]
            lib.pbbi_sink_append.restype = ctypes.c_int64
            lib.pbbi_sink_append.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64]
            lib.pbbi_sink_close.restype = ctypes.c_int
            lib.pbbi_sink_close.argtypes = [ctypes.c_void_p]
            lib.pbbi_sink_info.restype = ctypes.c_int64
            lib.pbbi_sink_info.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
            _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# N-body IC parsing
# ---------------------------------------------------------------------------


def parse_nbody_text(text: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                         float, float]:
    """Parse the reference IC format -> (mass[N], x[N,3], v[N,3], tmax, dt).

    Native fast path when the compiled library is available; otherwise a
    numpy tokenizer (still vectorised, unlike the reference's per-line
    loop).
    """
    lib = get_lib()
    if lib is not None:
        raw = text.encode()
        tmax = ctypes.c_double()
        dt = ctypes.c_double()
        n = lib.pbbi_nbody_header(raw, ctypes.byref(tmax), ctypes.byref(dt))
        if n < 0:
            raise ValueError("truncated N-body input: missing header")
        mass = np.empty(n, np.float64)
        pos = np.empty((n, 3), np.float64)
        vel = np.empty((n, 3), np.float64)
        rc = lib.pbbi_nbody_parse(
            raw, n,
            mass.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            vel.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc != 0:
            raise ValueError(
                f"truncated N-body input: N={n} needs {3 + 7 * n} tokens")
        return mass, pos, vel, tmax.value, dt.value
    # fallback: numpy tokenizer
    tokens = text.split()
    if len(tokens) < 3:
        raise ValueError("truncated N-body input: missing header")
    n = int(tokens[0])
    tmax_f, dt_f = float(tokens[1]), float(tokens[2])
    need = 3 + 7 * n
    if len(tokens) < need:
        raise ValueError(
            f"truncated N-body input: N={n} needs {need} tokens, got "
            f"{len(tokens)}")
    vals = np.asarray(tokens[3:need], dtype=np.float64)
    return (vals[:n], vals[n:4 * n].reshape(n, 3),
            vals[4 * n:].reshape(n, 3), tmax_f, dt_f)


# ---------------------------------------------------------------------------
# Sample sink
# ---------------------------------------------------------------------------

_MAGIC = 0x50424249


class SampleSink:
    """Append-only float32 sample store (native-backed when available)."""

    def __init__(self, path: str, num_walkers: int, num_dims: int):
        self.path = path
        self.num_walkers = int(num_walkers)
        self.num_dims = int(num_dims)
        self.num_rows = 0
        self._lib = get_lib()
        if self._lib is not None:
            self._handle = self._lib.pbbi_sink_open(
                path.encode(), self.num_walkers, self.num_dims)
            if not self._handle:
                raise OSError(f"cannot open sink {path}")
            self._f = None
        else:
            self._handle = None
            self._f = open(path, "wb")
            self._write_header()

    def _write_header(self):
        head = np.zeros(8, np.uint32)
        head[0] = _MAGIC
        head[1] = 1
        head[2] = self.num_walkers
        head[3] = self.num_dims
        head[4] = self.num_rows & 0xFFFFFFFF
        head[5] = self.num_rows >> 32
        self._f.seek(0)
        self._f.write(head.tobytes())

    def append(self, chunk) -> int:
        """chunk: [..., num_dims] float32-castable; returns total rows."""
        arr = np.ascontiguousarray(
            np.asarray(chunk), dtype=np.float32).reshape(-1, self.num_dims)
        if self._handle is not None:
            rows = self._lib.pbbi_sink_append(
                self._handle,
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                arr.shape[0])
            if rows < 0:
                raise OSError("sink write failed")
            self.num_rows = rows
        else:
            self._f.seek(0, os.SEEK_END)
            self._f.write(arr.tobytes())
            self.num_rows += arr.shape[0]
        return self.num_rows

    def close(self):
        if self._handle is not None:
            rc = self._lib.pbbi_sink_close(self._handle)
            self._handle = None
            if rc != 0:
                raise OSError("sink close failed")
        elif self._f is not None:
            self._write_header()
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_samples(path: str) -> np.ndarray:
    """Read a sink file -> [num_rows, num_dims] float32 (memory-mapped)."""
    head = np.fromfile(path, dtype=np.uint32, count=8)
    if head.shape[0] < 8 or head[0] != _MAGIC:
        raise ValueError(f"{path} is not a PBBI sample file")
    num_dims = int(head[3])
    num_rows = int(head[4]) | (int(head[5]) << 32)
    data = np.memmap(path, dtype=np.float32, mode="r", offset=32,
                     shape=(num_rows, num_dims))
    return data
