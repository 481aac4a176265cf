"""ctypes bridge to the native exact max-clique solver.

Builds ``clique/native/maxclique.cc`` into a shared library on first use
(cached next to the source, rebuilt when the source changes) and exposes
:func:`exact_max_clique`. This is the host-side tail of the pipeline — the
role PMC plays for the reference (graph.cc:105-122) — used only in
``PMC_EXACT`` mode; the heuristic and k-core modes stay fully on device.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "maxclique.cc")
_LIB = os.path.join(_NATIVE_DIR, "libmaxclique.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        needs_build = (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        )
        if needs_build:
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.tpureg_max_clique.restype = ctypes.c_int
        lib.tpureg_max_clique.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tpureg_max_clique_mt.restype = ctypes.c_int
        lib.tpureg_max_clique_mt.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.tpureg_core_numbers.restype = None
        lib.tpureg_core_numbers.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def pack_adjacency(adj: np.ndarray) -> Tuple[np.ndarray, int]:
    """Pack an (N, N) bool adjacency into row-major uint64 bitset words."""
    adj = np.asarray(adj, dtype=bool)
    n = adj.shape[0]
    words = (n + 63) // 64
    bits = np.packbits(adj, axis=1, bitorder="little")
    row_bytes = np.zeros((n, words * 8), dtype=np.uint8)
    row_bytes[:, : bits.shape[1]] = bits
    return row_bytes.view(np.uint64).reshape(n, words), words


def exact_max_clique(
    adj: np.ndarray, time_limit: float = 3600.0, num_threads: int = 1
) -> Tuple[List[int], bool]:
    """Exact maximum clique of a dense boolean adjacency matrix.

    Returns (sorted vertex list, timed_out). Under time pressure the best
    clique found so far is returned with ``timed_out=True`` (PMC semantics).
    ``num_threads`` > 1 searches root subtrees on worker threads that share
    the incumbent bound (the reference's PMC OpenMP model, graph.cc:38);
    ``num_threads <= 0`` uses all hardware threads.
    """
    adj = np.asarray(adj, dtype=bool)
    n = adj.shape[0]
    if n == 0:
        return [], False
    lib = _load()
    packed, words = pack_adjacency(adj)
    packed = np.ascontiguousarray(packed)
    out = np.zeros(n, dtype=np.int32)
    flag = np.zeros(1, dtype=np.int32)
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    size = lib.tpureg_max_clique_mt(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        np.int32(n),
        np.int32(words),
        ctypes.c_double(time_limit),
        np.int32(num_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        flag.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return sorted(int(v) for v in out[:size]), bool(flag[0])


def native_core_numbers(adj: np.ndarray) -> np.ndarray:
    """Core numbers from the native library (parity oracle for the device kernel)."""
    adj = np.asarray(adj, dtype=bool)
    n = adj.shape[0]
    lib = _load()
    packed, words = pack_adjacency(adj)
    packed = np.ascontiguousarray(packed)
    out = np.zeros(n, dtype=np.int32)
    lib.tpureg_core_numbers(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        np.int32(n),
        np.int32(words),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
