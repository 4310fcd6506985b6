"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/XLA; the HOST runtime around it goes native
where it is measurably hot. First resident: the binned-SAH split
(`sah.cpp`), the single hot spot of every BVH build (the NumPy
`_sah_partition` was 12.7 s of a 16.6 s blob-subdiv-6 scene build —
33.5k calls across the binary tree and both packet layouts).

The .so is compiled LAZILY with g++ on first use and cached next to
this file; every failure (no g++, sandboxed build dir, bad load) falls
back silently to the NumPy implementation — the native path is an
accelerator, never a dependency. `TPURT_NATIVE=0` disables it outright.
The port is bit-exact by construction (see sah.cpp's header) and
pinned by tests/test_native_sah.py + the golden images.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "_sah.so"
_SRC = _DIR / "sah.cpp"

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("TPURT_NATIVE", "1") == "0":
        return None
    try:
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            # PID-suffixed temp + atomic rename: concurrent first-use
            # builds (e.g. pytest workers) each publish a whole file
            tmp = _DIR / f"_sah.so.tmp.{os.getpid()}"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", str(tmp),
                 str(_SRC)],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, _SO)  # atomic publish
        lib = ctypes.CDLL(str(_SO))
        fn = lib.sah_partition
        fn.restype = ctypes.c_longlong
        i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        # ndpointer argtypes: ndarrays pass directly (the former
        # per-call .ctypes.data_as chain was ~40% of native build time)
        fn.argtypes = [f32, f32, f32, i64, ctypes.c_longlong,
                       ctypes.c_longlong, i64, i64,
                       ctypes.POINTER(ctypes.c_longlong)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def make_partitioner(tlo, thi, centroid, sah_bins):
    """Prebound native partitioner for one build, or None if unavailable.

    The returned callable(idx) -> (left, right, axis) is bit-identical
    to the NumPy _sah_partition (tested). Pointer conversion for the
    (fixed-per-build) geometry arrays happens ONCE here: per-call ctypes
    casts were ~40% of the native build time across the ~33k calls of a
    subdiv-6 build."""
    lib = _load()
    if lib is None:
        return None
    tlo = np.ascontiguousarray(tlo, np.float32)
    thi = np.ascontiguousarray(thi, np.float32)
    centroid = np.ascontiguousarray(centroid, np.float32)
    bins = ctypes.c_longlong(sah_bins)
    fn = lib.sah_partition
    empty = np.empty
    c_longlong, byref = ctypes.c_longlong, ctypes.byref

    def partition(idx):
        idx = np.ascontiguousarray(idx, np.int64)
        n = idx.shape[0]
        out_l = empty(n, np.int64)
        out_r = empty(n, np.int64)
        nleft = c_longlong(0)
        axis = fn(tlo, thi, centroid, idx, c_longlong(n),
                  bins, out_l, out_r, byref(nleft))
        k = nleft.value
        return out_l[:k], out_r[: n - k], int(axis)

    return partition


def sah_partition(idx, tlo, thi, centroid, sah_bins):
    """One-shot native split (tests); None if unavailable."""
    part = make_partitioner(tlo, thi, centroid, sah_bins)
    return None if part is None else part(idx)


def available() -> bool:
    return _load() is not None
