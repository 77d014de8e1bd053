"""Delaunay triangulation and point-cloud statistics (CPU, host-side).

Replaces the reference's CGAL-based native layer
(``src/triangulation.cpp:34-75`` ``triangulate`` and ``:121-134``
``find_average_spacing``) with Qhull (via scipy) and a KD-tree. The native
C++ fast path in ``csrc/`` accelerates mesh post-processing (adjacency,
hull extraction); the Delaunay itself is Qhull's C core, which is already
native code.
"""

from __future__ import annotations

import numpy as np


def triangulate(points: np.ndarray) -> np.ndarray:
    """Delaunay-tetrahedralize a 3D point cloud.

    Mirrors the reference API (``src/py_binding.cpp:239-256``): takes
    ``[V, 3]`` float points, returns ``[C, 4]`` int32 vertex-index
    quadruples for all finite tetrahedra.

    Degenerate (zero-volume) simplices that Qhull emits for cospherical/
    coplanar inputs are KEPT: the marcher's neighbor adjacency must stay
    watertight (CGAL keeps the full complex the same way, reference
    ``src/triangulation.cpp:34-75``). Dropping a sliver would turn its
    kept neighbors' shared faces into fake boundary (−1), terminating
    rays mid-interior. Their (near-)singular plane tables are
    regularized in ``mesh.compute_planes`` so rays forward through them
    with ~zero chord instead of getting lost.
    """
    from scipy.spatial import Delaunay  # deferred: scipy import is slow

    points = np.ascontiguousarray(points, dtype=np.float64)
    if points.ndim != 2 or points.shape[1] != 3:
        raise ValueError(f"points must be [V, 3], got {points.shape}")
    if len(points) < 4:
        raise ValueError("need at least 4 points to tetrahedralize")
    tri = Delaunay(points, qhull_options="Qbb Qc Qz Q12")
    cells = tri.simplices.astype(np.int32)
    # Qz adds a point at infinity; simplices touching it are already
    # excluded by scipy, but guard against out-of-range indices anyway.
    cells = cells[(cells < len(points)).all(axis=1)]
    return np.ascontiguousarray(cells)


def _signed_volumes(points: np.ndarray, cells: np.ndarray) -> np.ndarray:
    v = points[cells]  # [C, 4, 3]
    e = v[:, 1:] - v[:, :1]  # [C, 3, 3]
    return np.linalg.det(e) / 6.0


def find_average_spacing(points: np.ndarray, num_neighbors: int = 6) -> float:
    """Average distance from each point to its k nearest neighbors.

    Same contract as CGAL ``compute_average_spacing`` used by the reference
    (``src/triangulation.cpp:121-134``): for every point, average the
    distances to its ``num_neighbors`` nearest neighbors (excluding
    itself), then average over points. Uses the native grid-kNN when
    ``csrc/libtetra_geom.so`` is built, else a KD-tree.
    """
    try:
        from . import native

        if native.available():
            return native.average_spacing(
                np.ascontiguousarray(points, np.float32), num_neighbors
            )
    except Exception:
        pass
    from scipy.spatial import cKDTree

    points = np.ascontiguousarray(points, dtype=np.float64)
    tree = cKDTree(points)
    k = min(num_neighbors + 1, len(points))
    dists, _ = tree.query(points, k=k)
    return float(dists[:, 1:].mean())
