"""Build + bind the C++ patch-synthesis backend via ctypes.

Compiled on first use with g++ (-O3 -fopenmp); cached next to the
source.  Exposed as ``synthesize_level_native`` with numpy arrays —
see patchmatch.cpp for semantics.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "patchmatch.cpp")
_LIB = os.path.join(_DIR, "libpatchmatch.so")
_lock = threading.Lock()
_lib = None


def build_library(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    with _lock:
        if force or not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            cmd = [
                "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
                "-std=c++17", _SRC, "-o", _LIB,
            ]
            subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.pm_synthesize_level.argtypes = [
            f32p, f32p, f32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_uint64,
            i32p, f32p, f32p,
        ]
        lib.pm_synthesize_level.restype = None
        _lib = lib
    return _lib


def is_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def synthesize_level_native(
    style_src: np.ndarray,      # [sh, sw, cs] float32
    guides_src: np.ndarray,     # [sh, sw, cg]
    guides_tgt: np.ndarray,     # [th, tw, cg]
    style_weights: np.ndarray,  # [cs]
    guide_weights: np.ndarray,  # [cg]
    nnf: np.ndarray,            # [th, tw, 2] int32, modified in place
    *,
    patch: int,
    pm_iters: int,
    sv_iters: int,
    uniformity: float,
    seed: int = 0,
):
    lib = _load()
    sh, sw, cs = style_src.shape
    th, tw, cg = guides_tgt.shape
    out_style = np.zeros((th, tw, cs), np.float32)
    out_error = np.zeros((th, tw), np.float32)
    lib.pm_synthesize_level(
        np.ascontiguousarray(style_src, np.float32),
        np.ascontiguousarray(guides_src, np.float32),
        np.ascontiguousarray(guides_tgt, np.float32),
        np.ascontiguousarray(style_weights, np.float32),
        np.ascontiguousarray(guide_weights, np.float32),
        sh, sw, th, tw, cs, cg,
        patch, pm_iters, sv_iters, float(uniformity), int(seed),
        nnf, out_style, out_error,
    )
    return out_style, out_error, nnf
