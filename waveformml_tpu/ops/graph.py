"""Graph-construction ops: window-neighborhood edges and per-event kNN.

The reference builds edges with a C kernel compiled at import
(ref: src/custom_functions/__init__.py:5-35 + cffi.c:5-37, wrapped by
src/utils/GraphUtils.py:7-40 window_edges) and PyG's ``knn_graph``. Here the
native side is a C++/OpenMP shared library (csrc/window_edges.cpp) built on
first use with g++ and loaded via ctypes, with pure-numpy fallbacks
(ref: GraphUtils.py:44-57 get_edges) when no compiler is available.

Edge conventions match the reference: window edges are symmetric (i, j)+(j, i)
pairs in row order with optional leading self loops; kNN edges are
(source=neighbor, target=row) pairs like PyG's default flow.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_LIB = None
_LIB_FAILED = False
_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "window_edges.cpp")
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")


def _src_digest() -> str:
    import hashlib
    import platform

    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read())
    h.update(b"debug" if os.environ.get("WFML_NATIVE_DEBUG") == "1" else b"opt")
    # the release build is -march=native: a cache dir that travels to a
    # different host (NFS home, baked image) must rebuild there, not load a
    # foreign-microarch binary and SIGILL — key the stamp on the machine too
    h.update(platform.node().encode() + b"/" + platform.machine().encode())
    return h.hexdigest()


def _build_library() -> Optional[str]:
    # everything here can fail on a hostile install (csrc/ absent from a
    # wheel, read-only site-packages, no g++) — any failure means numpy
    # fallback, never a crash in the caller
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        so_path = os.path.join(_CACHE_DIR, "libwindow_edges.so")
        stamp = so_path + ".src_hash"
        digest = _src_digest()
        # content-hash staleness check: mtimes are unreliable after a fresh
        # checkout, and a foreign -march=native binary must never be loaded
        if os.path.exists(so_path) and os.path.exists(stamp):
            with open(stamp) as f:
                if f.read().strip() == digest:
                    return so_path
        # WFML_NATIVE_DEBUG=1 → debug build (the reference's custom_functions
        # toggles -g -O0 -pedantic -Wall the same way, __init__.py:14-19)
        opt = (["-g", "-O0", "-pedantic", "-Wall"]
               if os.environ.get("WFML_NATIVE_DEBUG") == "1"
               else ["-O3", "-march=native"])
        # compile to a per-pid temp and os.replace into place: concurrent
        # builders (pytest-xdist, trainer + prep job on one checkout) must
        # never dlopen a half-written .so
        tmp_so = f"{so_path}.tmp.{os.getpid()}"
        cmd = ["g++", *opt, "-fopenmp", "-shared", "-fPIC", _SRC, "-o", tmp_so]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp_so, so_path)
            tmp_stamp = f"{stamp}.tmp.{os.getpid()}"
            with open(tmp_stamp, "w") as f:
                f.write(digest)
            os.replace(tmp_stamp, stamp)
            return so_path
        finally:
            if os.path.exists(tmp_so):
                os.unlink(tmp_so)
    except Exception as e:
        log.warning("native edge-kernel build failed (%s); using numpy fallback", e)
        return None


def _get_lib():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = _build_library()
    if so is None:
        _LIB_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(so)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.window_edges_count.restype = ctypes.c_int64
        lib.window_edges_count.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                           i64p, i64p, ctypes.c_bool, i64p]
        lib.window_edges_fill.restype = None
        lib.window_edges_fill.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                          i64p, i64p, ctypes.c_bool, i64p, i64p, i64p]
        lib.knn_edges.restype = ctypes.c_int64
        lib.knn_edges.argtypes = [ctypes.c_int64, ctypes.c_int64, f64p, f64p, i64p,
                                  ctypes.c_bool, i64p, i64p]
    except OSError as e:
        # a corrupt cached binary (killed build from an older non-atomic
        # layout, disk issue) must degrade to numpy, not crash the dataset
        log.warning("native edge-kernel load failed (%s); using numpy fallback", e)
        _LIB_FAILED = True
        return None
    _LIB = lib
    return _LIB


def _ptr64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _ptrf64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def window_edges(coo: np.ndarray, batch: np.ndarray, max_dist: int = 1,
                 self_loops: bool = True) -> np.ndarray:
    """Edges between same-event rows within Chebyshev distance ≤ max_dist
    (the C bound is strict ``< max_dist + 1``, ref: GraphUtils.py:30).

    coo: [N, 2] int coords; batch: [N] event ids (sorted). Returns [2, E] int64.
    """
    x = np.ascontiguousarray(coo[:, 0], dtype=np.int64)
    y = np.ascontiguousarray(coo[:, 1], dtype=np.int64)
    b = np.ascontiguousarray(batch, dtype=np.int64)
    n = x.shape[0]
    if n == 0:
        return np.zeros((2, 0), dtype=np.int64)
    bound = max_dist + 1
    lib = _get_lib()
    if lib is None:
        return _window_edges_numpy(x, y, b, bound, self_loops)
    counts = np.zeros(n, dtype=np.int64)
    total = lib.window_edges_count(bound, n, _ptr64(x), _ptr64(y), _ptr64(b),
                                   self_loops, _ptr64(counts))
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    e1 = np.zeros(total, dtype=np.int64)
    e2 = np.zeros(total, dtype=np.int64)
    lib.window_edges_fill(bound, n, _ptr64(x), _ptr64(y), _ptr64(b),
                          self_loops, _ptr64(offsets), _ptr64(e1), _ptr64(e2))
    return np.stack([e1, e2])


def _window_edges_numpy(x, y, b, bound, self_loops) -> np.ndarray:
    """Vectorized fallback (quadratic within each event)."""
    edges1, edges2 = [], []
    n = x.shape[0]
    starts = np.flatnonzero(np.diff(b)) + 1
    bounds = np.concatenate([[0], starts, [n]])
    for e in range(len(bounds) - 1):
        lo, hi = bounds[e], bounds[e + 1]
        for i in range(lo, hi):
            if self_loops:
                edges1.append(i)
                edges2.append(i)
            for j in range(i + 1, hi):
                if abs(x[i] - x[j]) < bound and abs(y[i] - y[j]) < bound:
                    edges1 += [i, j]
                    edges2 += [j, i]
    return np.stack([np.asarray(edges1, dtype=np.int64),
                     np.asarray(edges2, dtype=np.int64)]) if edges1 else \
        np.zeros((2, 0), dtype=np.int64)


def knn_graph(pos: np.ndarray, k: int, batch: np.ndarray,
              loop: bool = False) -> np.ndarray:
    """Per-event k nearest neighbors; (source=neighbor, target=row) pairs
    (PyG knn_graph flow convention). Returns [2, E] int64."""
    n = pos.shape[0]
    if n == 0:
        return np.zeros((2, 0), dtype=np.int64)
    px = np.ascontiguousarray(pos[:, 0], dtype=np.float64)
    py = np.ascontiguousarray(pos[:, 1], dtype=np.float64)
    b = np.ascontiguousarray(batch, dtype=np.int64)
    lib = _get_lib()
    if lib is None:
        return _knn_numpy(px, py, b, k, loop)
    cap = n * k
    e1 = np.zeros(cap, dtype=np.int64)
    e2 = np.zeros(cap, dtype=np.int64)
    total = lib.knn_edges(k, n, _ptrf64(px), _ptrf64(py), _ptr64(b), loop,
                          _ptr64(e1), _ptr64(e2))
    return np.stack([e1[:total], e2[:total]])


def _knn_numpy(px, py, b, k, loop) -> np.ndarray:
    edges1, edges2 = [], []
    n = px.shape[0]
    starts = np.flatnonzero(np.diff(b)) + 1
    bounds = np.concatenate([[0], starts, [n]])
    for e in range(len(bounds) - 1):
        lo, hi = bounds[e], bounds[e + 1]
        p = np.stack([px[lo:hi], py[lo:hi]], axis=1)
        d = ((p[:, None] - p[None, :]) ** 2).sum(-1)
        if not loop:
            np.fill_diagonal(d, np.inf)
        kk = min(k, hi - lo - (0 if loop else 1))
        if kk <= 0:
            continue
        idx = np.argsort(d, axis=1)[:, :kk]
        for i in range(hi - lo):
            for j in idx[i]:
                edges1.append(lo + int(j))
                edges2.append(lo + i)
    return np.stack([np.asarray(edges1, dtype=np.int64),
                     np.asarray(edges2, dtype=np.int64)]) if edges1 else \
        np.zeros((2, 0), dtype=np.int64)


def pad_edges(edges: np.ndarray, n_edges: int,
              edge_attr: Optional[np.ndarray] = None):
    """Pad an edge list to a static size with a validity mask; padded edges
    point at node 0 and are masked out of aggregations."""
    e = edges.shape[1]
    assert e <= n_edges, f"{e} edges > bucket {n_edges}"
    out = np.zeros((2, n_edges), dtype=np.int64)
    out[:, :e] = edges
    mask = np.zeros(n_edges, dtype=bool)
    mask[:e] = True
    if edge_attr is None:
        return out, mask
    attr = np.zeros((n_edges,) + edge_attr.shape[1:], dtype=edge_attr.dtype)
    attr[:e] = edge_attr
    return out, mask, attr


def cartesian_edge_attr(pos: np.ndarray, edges: np.ndarray,
                        local: bool = False, norm: bool = True,
                        max_value: Optional[float] = None) -> np.ndarray:
    """PyG Cartesian / LocalCartesian edge attributes: relative target−source
    positions, optionally normalized to [0, 1] (ref: GraphNet.py:148-158)."""
    rel = pos[edges[1]] - pos[edges[0]]
    if local:
        # PyG LocalCartesian: per-target-node scalar max over incoming edges
        amax = np.abs(rel).max(axis=1) if rel.size else np.zeros(0)
        per_node = np.zeros(pos.shape[0])
        np.maximum.at(per_node, edges[1], amax)
        scale = np.maximum(per_node[edges[1]], 1e-9)[:, None]
        return rel / (2 * scale) + 0.5
    if norm:
        mv = max_value if max_value is not None else np.abs(rel).max(initial=1e-9)
        return rel / (2 * mv) + 0.5
    return rel


def _bench_window_edges(n: int = 100_000) -> float:
    """Edge-kernel micro-benchmark (the reference's GraphUtils.test on 100k
    coordinates — ref :58-70). Returns seconds for one call."""
    import time

    rng = np.random.default_rng(0)
    batch = np.sort(rng.integers(0, n // 4, n)).astype(np.int64)
    coo = rng.integers(0, 14, (n, 2)).astype(np.int64)
    order = np.lexsort((coo[:, 1], coo[:, 0], batch))
    coo, batch = coo[order], batch[order]
    t0 = time.perf_counter()
    edges = window_edges(coo, batch, max_dist=1, self_loops=True)
    dt = time.perf_counter() - t0
    print(f"window_edges: {n} coords -> {edges.shape[1]} edges in {dt:.3f}s")
    return dt


if __name__ == "__main__":
    _bench_window_edges()
