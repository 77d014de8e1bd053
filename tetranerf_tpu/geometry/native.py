"""ctypes bindings for the native C++ geometry library (csrc/tetra_geom.cpp).

The native library accelerates host-side mesh preprocessing (face
adjacency, spacing statistics) for multi-million-cell meshes. All entry
points have pure-numpy fallbacks in :mod:`tetranerf_tpu.geometry.mesh`;
this module reports availability and is a thin marshalling layer.

Build with ``make -C csrc`` (or ``python -m tetranerf_tpu.geometry.native``)
which produces ``csrc/libtetra_geom.so``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None
_SEARCHED = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "libtetra_geom.so"),
    os.path.join(_CSRC, "libtetra_geom.so"),
]


def _load():
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    for path in _LIB_PATHS:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.tetra_build_adjacency.restype = ctypes.c_int
            lib.tetra_build_adjacency.argtypes = [
                ctypes.POINTER(ctypes.c_int32),  # cells [C,4]
                ctypes.c_int64,  # num_cells
                ctypes.POINTER(ctypes.c_int32),  # out neighbors [C,4]
            ]
            lib.tetra_average_spacing.restype = ctypes.c_double
            lib.tetra_average_spacing.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # points [N,3]
                ctypes.c_int64,  # num_points
                ctypes.c_int,  # num_neighbors
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def build_adjacency(cells: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    num_cells = cells.shape[0]
    out = np.empty((num_cells, 4), dtype=np.int32)
    rc = lib.tetra_build_adjacency(
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_cells,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        raise ValueError("a triangle face is shared by more than 2 tetrahedra")
    return out


def average_spacing(points: np.ndarray, num_neighbors: int = 6) -> float:
    lib = _load()
    assert lib is not None
    points = np.ascontiguousarray(points, dtype=np.float32)
    return float(
        lib.tetra_average_spacing(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            points.shape[0],
            num_neighbors,
        )
    )


def build() -> None:
    """Compile the native library in-place."""
    subprocess.check_call(["make", "-C", os.path.abspath(_CSRC)])
    global _SEARCHED
    _SEARCHED = False


if __name__ == "__main__":
    build()
    print("native geometry library available:", available(), file=sys.stderr)
