"""ctypes binding for the native (C++/OpenMP) geometry engine.

The reference's only native code is two CUDA kernels (paper_2/_kernels.py);
pcx's TPU compute path is XLA, and the native runtime component here is the
host-side geometry preprocessing: flag evaluation over 3N^3 staggered DoFs
(reference cold path: dielectric.py:84-87, "<1 s for standard grids",
README.md:116).  Falls back to the numpy implementation when unbuilt.

Build: ``python -m pcx.native --build`` or ``make -C csrc``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "csrc")
_LIB_PATH = os.path.join(_CSRC, "libpcxgeom.so")

FLAG_IDS = {
    "sc_flat1": 0,
    "sc_flat2": 1,
    "sc_curv": 2,
    "bcc_sg": 3,
    "bcc_dg": 4,
    "fcc": 5,
}

_lib = None


def build(verbose: bool = False) -> bool:
    """Compile the shared library with make/g++."""
    try:
        out = subprocess.run(["make", "-C", _CSRC],
                             capture_output=True, text=True, timeout=120)
        if verbose:
            print(out.stdout, out.stderr)
        return out.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building on demand if sources are present)."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not os.path.exists(os.path.join(_CSRC, "pcx_geometry.cpp")):
            return None
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f8p = ctypes.POINTER(ctypes.c_double)
    lib.pcx_edge_mask.argtypes = [ctypes.c_int, ctypes.c_int, f8p, u8p]
    lib.pcx_edge_mask.restype = ctypes.c_int
    lib.pcx_volume_mask.argtypes = [ctypes.c_int, ctypes.c_int, f8p, u8p]
    lib.pcx_volume_mask.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def edge_mask(n: int, lattice: str, ct_inv_t: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None or lattice not in FLAG_IDS:
        return None
    out = np.empty(3 * n**3, dtype=np.uint8)
    m = np.ascontiguousarray(ct_inv_t, dtype=np.float64)
    rc = lib.pcx_edge_mask(
        n, FLAG_IDS[lattice],
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out.reshape(3, n, n, n).astype(bool)


def volume_mask(n: int, lattice: str, ct_inv_t: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None or lattice not in FLAG_IDS:
        return None
    out = np.empty(n**3, dtype=np.uint8)
    m = np.ascontiguousarray(ct_inv_t, dtype=np.float64)
    rc = lib.pcx_volume_mask(
        n, FLAG_IDS[lattice],
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out.reshape(n, n, n).astype(bool)


if __name__ == "__main__":
    if "--build" in sys.argv:
        ok = build(verbose=True)
        print("built" if ok else "BUILD FAILED")
        sys.exit(0 if ok else 1)
    print("available:", available())
