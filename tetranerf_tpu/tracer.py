"""Drop-in ``TetrahedraTracer`` façade mirroring the reference's public
tracer object (``tetranerf/utils/extension/__init__.py:23-26``,
``src/py_binding.cpp:433-449``).

The reference constructs a per-GPU OptiX tracer and uploads the mesh with
``load_tetrahedra``; here the "upload" builds the TPU mesh structure
(adjacency + plane tables) and every method is a jit-compatible call into
:mod:`tetranerf_tpu.ops`. ``device`` is accepted for signature parity and
selects the JAX device to place the tables on.

    tracer = TetrahedraTracer()
    tracer.load_tetrahedra(vertices, cells)
    out = tracer.trace_rays(origins, directions, 512)
    cells = tracer.find_visited_cells(
        out["num_visited_cells"], out["visited_cells"],
        out["barycentric_coordinates"], out["hit_distances"],
        out["vertex_indices"], distances)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .geometry.mesh import TetrahedraMesh, build_mesh
from .ops.matching import find_visited_cells as _find_visited_cells
from .ops.parity import find_tetrahedra as _find_tetrahedra
from .ops.parity import trace_rays_triangles as _trace_rays_triangles
from .ops.traversal import trace_rays as _trace_rays


class TetrahedraTracer:
    """Object-style tracer API (reference parity)."""

    def __init__(self, device=None):
        self.device = device
        self.mesh: Optional[TetrahedraMesh] = None

    def load_tetrahedra(self, vertices, cells) -> None:
        """Build the traversal structure (the reference's GAS build,
        ``py_binding.cpp:144-161``)."""
        import jax

        mesh = build_mesh(
            np.asarray(vertices, np.float64),
            np.asarray(cells, np.int32),
            two_hop_table=False,
        )
        # Always place on device once: build_mesh returns host tables,
        # and repeated tracer calls should not re-transfer them.
        mesh = jax.device_put(mesh, self.device)
        self.mesh = mesh

    def _require_mesh(self) -> TetrahedraMesh:
        if self.mesh is None:
            raise RuntimeError("call load_tetrahedra first")
        return self.mesh

    def trace_rays(self, origins, directions, max_visited_cells: int = 512):
        """Reference-shaped traversal dict (``py_binding.cpp:53-76``);
        ``max_visited_cells`` need not be a power of two here."""
        return _trace_rays(
            self._require_mesh(), origins, directions, max_visited_cells
        )

    def find_visited_cells(
        self,
        num_visited_cells,
        visited_cells,
        barycentric_coordinates,
        hit_distances,
        vertex_indices,
        distances,
    ):
        return _find_visited_cells(
            num_visited_cells,
            visited_cells,
            barycentric_coordinates,
            hit_distances,
            vertex_indices,
            distances,
        )

    def find_tetrahedra(self, positions):
        return _find_tetrahedra(self._require_mesh(), positions)

    def trace_rays_triangles(self, origins, directions, max_hits: int = 512):
        return _trace_rays_triangles(
            self._require_mesh(), origins, directions, max_hits
        )
