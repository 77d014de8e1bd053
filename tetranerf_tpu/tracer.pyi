"""Typed surface of the tracer facade (mirrors the reference's
``tetranerf/utils/extension/__init__.pyi:10-86`` TypedDict schemas)."""

from typing import Optional, TypedDict

import jax
import numpy as np

from .geometry.mesh import TetrahedraMesh

ArrayLike = np.ndarray | jax.Array

class TraceRaysResult(TypedDict):
    num_visited_cells: jax.Array  # i32[R]
    visited_cells: jax.Array  # u32[R, T], UINT_MAX padded
    barycentric_coordinates: jax.Array  # f32[R, T, 2, 3]
    hit_distances: jax.Array  # f32[R, T, 2]
    vertex_indices: jax.Array  # u32[R, T, 4]

class FindVisitedCellsResult(TypedDict):
    cell_indices: jax.Array  # u32[R, S]
    vertex_indices: jax.Array  # u32[R, S, 4]
    mask: jax.Array  # bool[R, S]
    barycentric_coordinates: jax.Array  # f32[R, S, 3]

class FindTetrahedraResult(TypedDict):
    tetrahedra: jax.Array  # i32[P]
    barycentric_coordinates: jax.Array  # f32[P, 3]
    vertex_indices: jax.Array  # u32[P, 4]
    valid_mask: jax.Array  # bool[P]

class TraceRaysTrianglesResult(TypedDict):
    num_hits: jax.Array  # i32[R]
    hit_distances: jax.Array  # f32[R, H]
    vertex_indices: jax.Array  # u32[R, H, 3]
    barycentric_coordinates: jax.Array  # f32[R, H, 2]

class TetrahedraTracer:
    device: Optional[jax.Device]
    mesh: Optional[TetrahedraMesh]
    def __init__(self, device: Optional[jax.Device] = ...) -> None: ...
    def load_tetrahedra(
        self, vertices: ArrayLike, cells: ArrayLike
    ) -> None: ...
    def trace_rays(
        self,
        origins: ArrayLike,
        directions: ArrayLike,
        max_visited_cells: int = ...,
    ) -> TraceRaysResult: ...
    def find_visited_cells(
        self,
        num_visited_cells: ArrayLike,
        visited_cells: ArrayLike,
        barycentric_coordinates: ArrayLike,
        hit_distances: ArrayLike,
        vertex_indices: ArrayLike,
        distances: ArrayLike,
    ) -> FindVisitedCellsResult: ...
    def find_tetrahedra(self, positions: ArrayLike) -> FindTetrahedraResult: ...
    def trace_rays_triangles(
        self,
        origins: ArrayLike,
        directions: ArrayLike,
        max_hits: int = ...,
    ) -> TraceRaysTrianglesResult: ...
