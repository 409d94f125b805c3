"""Native (C++) runtime components, built on demand and bound via ctypes.

The reference gets its host-side speed from OpenCV's C++ (GrabCut's BK
max-flow, connected components).  The TPU framework keeps the compute path
on-device, and ships this native module for the *host* fallback path: a
FIFO push-relabel min-cut with global relabeling + gap heuristic
(maxflow.cpp), compiled with g++ at first use and cached next to the
source.  Everything degrades gracefully to the JAX solver when no compiler
is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_library() -> Optional[Path]:
    src = _HERE / "maxflow.cpp"
    out = _HERE / "_maxflow.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", str(src), "-o", str(out)],
            check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def load_maxflow() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native solver; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build_library()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.grid_mincut.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
        lib.grid_mincut.restype = None
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_maxflow() is not None


def grid_mincut_native(excess: np.ndarray, caps: tuple,
                       connectivity: int = 8) -> np.ndarray:
    """Solve the lattice min-cut on the host.  Same contract as
    ops.maxflow.grid_mincut: returns (H, W) bool, True = source/FG side."""
    lib = load_maxflow()
    if lib is None:
        raise RuntimeError("native maxflow unavailable (no g++?)")
    H, W = excess.shape
    ndir = 4 if connectivity == 8 else 2
    caps_arr = np.ascontiguousarray(
        np.stack([np.asarray(c, np.float32) for c in caps[:ndir]]),
        np.float32)
    excess = np.ascontiguousarray(excess, np.float32)
    out = np.zeros(H * W, np.uint8)
    lib.grid_mincut(H, W, connectivity, excess.reshape(-1),
                    caps_arr.reshape(-1), out)
    return out.reshape(H, W).astype(bool)
