"""ctypes bindings for the C++ mesh-repair kernels (cpp/libmesh_repair.so).

Loaded lazily; every entry point has a numpy fallback in repair.py, so the
library is an accelerator, not a dependency.  Build with ``make -C cpp``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> Path:
    return Path(__file__).resolve().parents[2] / "cpp" / "libmesh_repair.so"


def load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not path.exists() and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", str(path.parent)],
                capture_output=True, timeout=120, check=True,
            )
        except Exception:
            return None
    if not path.exists():
        return None
    lib = ctypes.CDLL(str(path))
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.face_components.restype = ctypes.c_int32
    lib.face_components.argtypes = [ctypes.c_int32, ctypes.c_int32, i32p, i32p]
    lib.boundary_edges.restype = ctypes.c_int32
    lib.boundary_edges.argtypes = [ctypes.c_int32, i32p, i32p]
    lib.weld_vertices.restype = ctypes.c_int32
    lib.weld_vertices.argtypes = [ctypes.c_int32, f32p, ctypes.c_double, i32p]
    _LIB = lib
    return _LIB


def face_components(n_verts: int, faces: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    out = np.empty(len(faces), np.int32)
    lib.face_components(np.int32(n_verts), np.int32(len(faces)), faces, out)
    return out


def boundary_edges(faces: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, np.int32)
    out = np.empty((len(faces) * 3, 2), np.int32)
    n = lib.boundary_edges(np.int32(len(faces)), faces, out)
    return out[:n]


def weld_vertices(points: np.ndarray, eps: float = 1e-6) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(points), np.int32)
    lib.weld_vertices(np.int32(len(points)), points, 1.0 / eps, out)
    return out
