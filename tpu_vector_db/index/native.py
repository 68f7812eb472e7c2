"""ctypes bridge to the native graph builder (native/graph_builder.cpp).

Compiles the shared library on first use (g++ is part of the image), caches
it next to the source, and degrades cleanly to the TPU builder when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "graph_builder.cpp"
_LIB = _SRC.with_name("libvdbgraph.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _compile() -> bool:
    base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-funroll-loops", "-fopenmp-simd", str(_SRC), "-o", str(_LIB)]
    # -march=native + omp-simd vectorize the distance reductions (4-8x);
    # fall back for compilers/targets that reject them. NOT -ffast-math:
    # linking crtfastmath.o flips the process-wide FTZ/DAZ flags on dlopen.
    for extra in (["-march=native", "-ffp-contract=fast"], []):
        try:
            subprocess.run(base[:-3] + extra + base[-3:], check=True,
                           capture_output=True, timeout=120)
            return True
        except (subprocess.SubprocessError, FileNotFoundError) as exc:
            last = exc
    logger.warning("native graph builder unavailable (%s)", last)
    return False


def load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SRC.exists():
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.build_graph.restype = ctypes.c_int
        lib.build_graph.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.extend_graph.restype = ctypes.c_int
        lib.extend_graph.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def build_graph(vectors: np.ndarray, metric: str, R: int,
                ef_construction: int, alpha: float,
                entry_count: int = 8):
    """vectors: PREPARED (n, d) float32 (cosine rows normalized).
    Returns (graph (n,R) int32, edge_keys (n,R) f32, entries int32)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native graph builder not available")
    vectors = np.ascontiguousarray(vectors, np.float32)
    n, d = vectors.shape
    graph = np.empty((n, R), np.int32)
    keys = np.empty((n, R), np.float32)
    entries = np.empty((entry_count,), np.int32)
    rc = lib.build_graph(
        vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int64(d),
        ctypes.c_int(1 if metric == "euclidean" else 0),
        ctypes.c_int(R), ctypes.c_int(ef_construction),
        ctypes.c_float(alpha),
        graph.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        entries.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(entry_count))
    if rc != 0:
        raise RuntimeError(f"native build_graph failed (rc={rc})")
    return graph, keys, np.unique(entries)


def extend_graph(vectors: np.ndarray, n_old: int, in_graph: np.ndarray,
                 in_keys: np.ndarray, metric: str, R: int,
                 ef_construction: int, alpha: float,
                 entry_count: int = 8):
    """Insert rows [n_old, len(vectors)) into an existing graph — O(batch)
    appends for per-shard subgraphs (no rebuild). vectors: PREPARED (n, d)
    float32 covering ALL rows; in_graph/in_keys: (n_old, R).
    Returns (graph (n,R) int32, edge_keys (n,R) f32, entries int32)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native graph builder not available")
    vectors = np.ascontiguousarray(vectors, np.float32)
    n, d = vectors.shape
    in_graph = np.ascontiguousarray(in_graph[:n_old], np.int32)
    in_keys = np.ascontiguousarray(in_keys[:n_old], np.float32)
    if n_old and in_graph.shape[1] != R:
        raise ValueError(f"existing graph degree {in_graph.shape[1]} != {R}")
    graph = np.empty((n, R), np.int32)
    keys = np.empty((n, R), np.float32)
    entries = np.empty((entry_count,), np.int32)
    rc = lib.extend_graph(
        vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n), ctypes.c_int64(n_old), ctypes.c_int64(d),
        ctypes.c_int(1 if metric == "euclidean" else 0),
        ctypes.c_int(R), ctypes.c_int(ef_construction),
        ctypes.c_float(alpha),
        in_graph.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        in_keys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        graph.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        entries.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(entry_count))
    if rc != 0:
        raise RuntimeError(f"native extend_graph failed (rc={rc})")
    return graph, keys, np.unique(entries)
