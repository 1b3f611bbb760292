"""ctypes bindings for the native C++ featurizer core.

``periodic_knn_native`` mirrors ``cgat_tpu.data.featurizer.periodic_neighbors``
exactly (same algorithm, same candidate ordering) at C++ speed; the loader
builds the shared library on first use and degrades to None when no compiler
is available.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    from .build import build
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.cgat_periodic_knn.restype = ctypes.c_int
    lib.cgat_periodic_knn.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # lattice
        ctypes.POINTER(ctypes.c_double),  # frac
        ctypes.c_int,                     # n
        ctypes.c_double,                  # radius
        ctypes.c_int,                     # max_nbr
        ctypes.POINTER(ctypes.c_int32),   # nbr_idx out
        ctypes.POINTER(ctypes.c_int32),   # shell out
        ctypes.POINTER(ctypes.c_double),  # dist out
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def periodic_knn_native(lattice, frac_coords, *, radius: float = 18.0,
                        max_nbr: int = 24):
    """Native periodic kNN; returns (nbr_idx, shell, dist) or None when some
    atom lacks max_nbr neighbors within radius. Raises RuntimeError if the
    library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (no g++?)")
    A = np.ascontiguousarray(lattice, np.float64)
    F = np.ascontiguousarray(frac_coords, np.float64)
    n = len(F)
    nbr = np.empty((n, max_nbr), np.int32)
    shell = np.empty((n, max_nbr), np.int32)
    dist = np.empty((n, max_nbr), np.float64)
    rc = lib.cgat_periodic_knn(
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        F.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, radius, max_nbr,
        nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        shell.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc == 1:
        return None
    if rc != 0:
        raise RuntimeError(f"native periodic_knn failed (code {rc})")
    return nbr.astype(np.int64), shell.astype(np.int64), dist
