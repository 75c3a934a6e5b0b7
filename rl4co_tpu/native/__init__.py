"""Native (C++) local-search components with a ctypes FFI boundary.

TPU-era equivalents of the reference's native pieces (SURVEY.md §2.9):
numba-JIT TSP 2-opt and the out-of-tree HGS-CVRP `.so`. The library is
compiled on first use with g++ (no pybind11 needed — plain C ABI + ctypes),
cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "local_search.cpp")
_LIB_PATH = os.path.join(_THIS_DIR, "liblocalsearch.so")

_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, _SRC, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB_PATH)) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.batched_two_opt.restype = None
    lib.batched_two_opt.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.batched_two_opt_nl.restype = None
    lib.batched_two_opt_nl.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.batched_cvrp_local_search.restype = None
    lib.batched_cvrp_local_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


def _f32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def batched_two_opt(
    locs: np.ndarray, tours: np.ndarray,
    max_iterations: int = 1000, num_threads: int | None = None,
) -> np.ndarray:
    """Batched TSP 2-opt (reference `tsp/local_search.py:16-43` semantics).

    locs: [B, N, 2] float32; tours: [B, N] int32 visiting order.
    Returns the improved tours (input is not modified).
    """
    locs = np.ascontiguousarray(locs, dtype=np.float32)
    out = np.ascontiguousarray(tours, dtype=np.int32).copy()
    b, n = out.shape
    nt = num_threads or min(os.cpu_count() or 1, 32)
    get_lib().batched_two_opt(_f32ptr(locs), _i32ptr(out), b, n, max_iterations, nt)
    return out


def batched_two_opt_nl(
    locs: np.ndarray, tours: np.ndarray,
    k: int = 12, max_passes: int = 200, num_threads: int | None = None,
) -> np.ndarray:
    """Neighbor-list 2-opt + Or-opt (first improvement, don't-look bits) —
    the large-N kernel: O(N·k) per pass vs the plain kernel's O(N²) scan
    per applied move. Same contract as :func:`batched_two_opt`.

    locs: [B, N, 2] float32; tours: [B, N] int32 visiting order.
    """
    locs = np.ascontiguousarray(locs, dtype=np.float32)
    out = np.ascontiguousarray(tours, dtype=np.int32).copy()
    b, n = out.shape
    nt = num_threads or min(os.cpu_count() or 1, 32)
    get_lib().batched_two_opt_nl(
        _f32ptr(locs), _i32ptr(out), b, n, k, max_passes, nt
    )
    return out


def batched_cvrp_local_search(
    locs: np.ndarray, demand: np.ndarray, actions: np.ndarray,
    capacity: float = 1.0, max_iterations: int = 100,
    num_threads: int | None = None,
) -> np.ndarray:
    """Batched CVRP neighborhood search (SWAP*-inspired; replaces HGS ctypes
    wrapper `cvrp/local_search.py`).

    locs: [B, N+1, 2] (depot at row 0); demand: [B, N+1] (depot 0, normalized);
    actions: [B, T] giant tours with depot separators. Returns improved tours.
    """
    locs = np.ascontiguousarray(locs, dtype=np.float32)
    demand = np.ascontiguousarray(demand, dtype=np.float32)
    out = np.ascontiguousarray(actions, dtype=np.int32).copy()
    b, n_nodes = demand.shape
    seq_len = out.shape[1]
    nt = num_threads or min(os.cpu_count() or 1, 32)
    get_lib().batched_cvrp_local_search(
        _f32ptr(locs), _f32ptr(demand), ctypes.c_float(capacity),
        _i32ptr(out), b, n_nodes, seq_len, max_iterations, nt,
    )
    return out
