"""Native (C++) components.

The reference's runtime core is C++ (lib/htool); here the host-side
runtime pieces that matter at production scale are native too, compiled
on demand from the sources in this directory with g++ into a shared
library and bound via ctypes (no pybind11 in the image).

Currently: the cluster-tree builder (cluster_builder.cpp).  The Python
implementations remain as behavior-defining fallbacks; parity is pinned
by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["cluster_builder.cpp"]
_LIB_BASENAME = "libhtool_native.so"

_lock = threading.Lock()
_lib = None
_load_failed = False


def _cache_dir() -> str:
    d = os.environ.get("HTOOL_TPU_NATIVE_DIR")
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache",
                         "htool_python_tpu", "native")
    os.makedirs(d, exist_ok=True)
    return d


def _source_stamp() -> float:
    return max(os.path.getmtime(os.path.join(_HERE, s)) for s in _SOURCES)


def _build_library(out_path: str) -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", out_path] + [os.path.join(_HERE, s) for s in _SOURCES]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if os.environ.get("HTOOL_TPU_NO_NATIVE"):
            _load_failed = True
            return None
        path = os.path.join(_cache_dir(), _LIB_BASENAME)
        try:
            if (not os.path.exists(path)
                    or os.path.getmtime(path) < _source_stamp()):
                _build_library(path)
            lib = ctypes.CDLL(path)
        except Exception:
            _load_failed = True
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.ct_build.restype = ctypes.c_void_p
        lib.ct_build.argtypes = [f64p, f64p, f64p, ctypes.c_int,
                                 ctypes.c_int64, ctypes.c_int,
                                 ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, i64p, ctypes.c_int64, i64p]
        lib.ct_nb_nodes.restype = ctypes.c_int64
        lib.ct_nb_nodes.argtypes = [ctypes.c_void_p]
        lib.ct_nb_partitions.restype = ctypes.c_int64
        lib.ct_nb_partitions.argtypes = [ctypes.c_void_p]
        lib.ct_copy.restype = None
        lib.ct_copy.argtypes = [ctypes.c_void_p] + [i64p] * 6 + [f64p] * 2 \
            + [i64p]
        lib.ct_free.restype = None
        lib.ct_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def build_cluster_tree_native(coords: np.ndarray, point_radii: np.ndarray,
                              weights: np.ndarray, nb_children: int,
                              mls: int, minimal_depth: int,
                              direction_kind: int, split_kind: int,
                              top_parts):
    """Run the C++ builder.  `top_parts` = None or list of user-index
    arrays forming the partition level.  Returns the flat tree arrays
    (same layout as clustering.cluster.ClusterTree)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    dim, n = coords.shape
    point_radii = np.ascontiguousarray(point_radii, dtype=np.float64)
    weights = np.ascontiguousarray(weights, dtype=np.float64)

    if top_parts is None:
        perm = np.arange(n, dtype=np.int64)
        sizes_top = np.zeros(0, dtype=np.int64)
    else:
        perm = np.ascontiguousarray(np.concatenate(top_parts), dtype=np.int64)
        sizes_top = np.asarray([len(p) for p in top_parts], dtype=np.int64)

    h = lib.ct_build(
        _ptr(coords, ctypes.c_double), _ptr(point_radii, ctypes.c_double),
        _ptr(weights, ctypes.c_double), dim, n, int(nb_children), int(mls),
        int(minimal_depth), int(direction_kind), int(split_kind),
        _ptr(sizes_top, ctypes.c_int64), len(sizes_top),
        _ptr(perm, ctypes.c_int64))
    try:
        nn = lib.ct_nb_nodes(h)
        npart = lib.ct_nb_partitions(h)
        offsets = np.empty(nn, dtype=np.int64)
        sizes = np.empty(nn, dtype=np.int64)
        depths = np.empty(nn, dtype=np.int64)
        parents = np.empty(nn, dtype=np.int64)
        cstart = np.empty(nn, dtype=np.int64)
        ccount = np.empty(nn, dtype=np.int64)
        centers = np.empty((nn, dim), dtype=np.float64)
        radii = np.empty(nn, dtype=np.float64)
        partition = np.empty(npart, dtype=np.int64)
        lib.ct_copy(h, _ptr(offsets, ctypes.c_int64),
                    _ptr(sizes, ctypes.c_int64), _ptr(depths, ctypes.c_int64),
                    _ptr(parents, ctypes.c_int64),
                    _ptr(cstart, ctypes.c_int64), _ptr(ccount, ctypes.c_int64),
                    _ptr(centers, ctypes.c_double),
                    _ptr(radii, ctypes.c_double),
                    _ptr(partition, ctypes.c_int64))
    finally:
        lib.ct_free(h)
    return (offsets, sizes, depths, parents, cstart, ccount, centers, radii,
            partition, perm)
