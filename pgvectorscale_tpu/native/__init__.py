"""Native host runtime (C++ via ctypes).

Compiles ``host_graph.cc`` into ``libpgvs_host.so`` on first use (g++ -O3)
and exposes the graph-maintenance routines.  Every entry point has a pure
NumPy fallback so the framework works without a toolchain; the native path
is required for the 50M-scale targets in BASELINE.md where Python-side
pointer chasing would dominate build time.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_graph.cc")
_LIB_PATH = os.path.join(_HERE, "libpgvs_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_library() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        _LIB_PATH,
        _SRC,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if os.environ.get("PGVS_NO_NATIVE"):
        # Debug kill-switch: force the NumPy fallbacks (used to isolate
        # native-code suspects when debugging memory issues).
        return None
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(_SRC):
            if not _build_library():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.pgvs_bfs_reachable.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, u8p,
        ]
        lib.pgvs_bfs_reachable.restype = None
        lib.pgvs_repair_orphans.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.pgvs_repair_orphans.restype = ctypes.c_int64
        lib.pgvs_degrees.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, i32p,
        ]
        lib.pgvs_degrees.restype = None
        lib.pgvs_in_degrees.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, i32p,
        ]
        lib.pgvs_in_degrees.restype = None
        lib.pgvs_to_csr.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int64, i64p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pgvs_to_csr.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def bfs_reachable(adj: np.ndarray, start: int) -> np.ndarray:
    """bool[n] reachability from `start` over int32[n, r] adjacency."""
    adj = np.ascontiguousarray(adj, dtype=np.int32)
    n, r = adj.shape
    lib = _load()
    if lib is not None:
        seen = np.zeros(n, dtype=np.uint8)
        lib.pgvs_bfs_reachable(adj, n, r, np.int32(start), seen)
        return seen.astype(bool)
    # NumPy fallback (frontier BFS).
    seen = np.zeros(n, dtype=bool)
    if start < 0 or n == 0:
        return seen
    seen[start] = True
    frontier = np.asarray([start])
    while frontier.size:
        nbrs = adj[frontier].reshape(-1)
        nbrs = nbrs[(nbrs >= 0) & (nbrs < n)]
        new = np.unique(nbrs[~seen[nbrs]])
        if new.size == 0:
            break
        seen[new] = True
        frontier = new
    return seen


def repair_orphans_inplace(adj: np.ndarray, start: int) -> int:
    """Force-connect unreachable nodes; mutates adj.  Returns #forced edges.
    Requires the native library (callers fall back to the Python repair in
    graph/build.py when unavailable)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    # The mutation must land in the caller's buffer: ascontiguousarray would
    # silently copy (and drop the repairs) for non-int32/non-contiguous
    # input, so reject such input instead.
    if adj.dtype != np.int32 or not adj.flags.c_contiguous:
        raise TypeError(
            "repair_orphans_inplace requires a C-contiguous int32 array"
        )
    n, r = adj.shape
    return int(lib.pgvs_repair_orphans(adj, n, r, np.int32(start)))


def degrees(adj: np.ndarray) -> np.ndarray:
    adj = np.ascontiguousarray(adj, dtype=np.int32)
    n, r = adj.shape
    lib = _load()
    if lib is not None:
        out = np.zeros(n, dtype=np.int32)
        lib.pgvs_degrees(adj, n, r, out)
        return out
    return (adj != -1).sum(axis=1).astype(np.int32)


def in_degrees(adj: np.ndarray) -> np.ndarray:
    adj = np.ascontiguousarray(adj, dtype=np.int32)
    n, r = adj.shape
    lib = _load()
    if lib is not None:
        out = np.zeros(n, dtype=np.int32)
        lib.pgvs_in_degrees(adj, n, r, out)
        return out
    valid = adj[adj >= 0]
    return np.bincount(valid, minlength=n).astype(np.int32)


def to_csr(adj: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Padded adjacency -> (indptr int64[n+1], indices int32[e])."""
    adj = np.ascontiguousarray(adj, dtype=np.int32)
    n, r = adj.shape
    lib = _load()
    if lib is not None:
        indptr = np.zeros(n + 1, dtype=np.int64)
        e = lib.pgvs_to_csr(adj, n, r, indptr, None)
        indices = np.zeros(max(int(e), 1), dtype=np.int32)
        lib.pgvs_to_csr(
            adj, n, r, indptr,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return indptr, indices[: int(e)]
    mask = adj != -1
    counts = mask.sum(axis=1)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, adj[mask].astype(np.int32)
