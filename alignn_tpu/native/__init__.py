"""Native (C++) host-side components, loaded via ctypes.

The reference's performance-critical host code lives in its
dependencies' C/C++ (DGL graph index, LMDB, jarvis neighbor math —
SURVEY.md §2b); this package owns the equivalents:

- `neighbors.cpp` — cell-list periodic neighbor search (the dataset
  preprocessing + MD graph-rebuild hot loop);
- `recordstore.cpp` — mmap record store for the preprocessed-graph cache
  (LMDB equivalent).

Libraries are compiled on first use with g++ (cached next to the
sources); every caller has a pure-numpy fallback, so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str) -> Optional[str]:
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(lib) and os.path.getmtime(lib) >= \
            os.path.getmtime(src):
        return lib
    try:
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", lib, src],
            stderr=subprocess.DEVNULL)
        return lib
    except Exception:
        return None


def load(name: str) -> Optional[ctypes.CDLL]:
    """Compile-on-demand + dlopen; None when no toolchain."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        lib_path = _build(name)
        lib = ctypes.CDLL(lib_path) if lib_path else None
        _LIBS[name] = lib
        return lib


def neighbors_lib() -> Optional[ctypes.CDLL]:
    lib = load("neighbors")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        import numpy as np
        from numpy.ctypeslib import ndpointer

        lib.periodic_pairs.restype = ctypes.c_int64
        lib.periodic_pairs.argtypes = [
            ndpointer(np.float64, flags="C_CONTIGUOUS"),  # lattice
            ndpointer(np.float64, flags="C_CONTIGUOUS"),  # frac
            ctypes.c_int64,                               # n
            ctypes.c_double,                              # cutoff
            ctypes.c_double,                              # atol
            ctypes.c_int64,                               # cap
            ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib._configured = True
    return lib


def periodic_pairs_native(lattice, frac, cutoff: float,
                          atol: float = 1e-5):
    """All (src, dst, image, disp, dist) pairs within cutoff, or None.

    ctypes front-end for neighbors.cpp; retries with a grown buffer when
    the first capacity guess overflows.
    """
    import numpy as np

    lib = neighbors_lib()
    if lib is None:
        return None
    lattice = np.ascontiguousarray(lattice, dtype=np.float64).reshape(9)
    frac = np.ascontiguousarray(frac, dtype=np.float64)
    n = frac.shape[0]
    cap = max(1024, n * 64)
    for _ in range(4):
        src = np.empty(cap, dtype=np.int32)
        dst = np.empty(cap, dtype=np.int32)
        images = np.empty(cap * 3, dtype=np.float64)
        disp = np.empty(cap * 3, dtype=np.float64)
        dist = np.empty(cap, dtype=np.float64)
        total = lib.periodic_pairs(lattice, frac.reshape(-1), n,
                                   float(cutoff), float(atol), cap,
                                   src, dst, images, disp, dist)
        if total < 0:
            return None  # singular lattice
        if total <= cap:
            t = int(total)
            return (src[:t].astype(np.int64), dst[:t].astype(np.int64),
                    images[:3 * t].reshape(t, 3),
                    disp[:3 * t].reshape(t, 3), dist[:t])
        cap = int(total) + 16
    return None
