"""Typed surface of the ops layer (the reference ships
``tetranerf/utils/extension/__init__.pyi``; this is the TPU analog)."""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import numpy as np

from ..geometry.mesh import TetrahedraMesh

ArrayLike = np.ndarray | jax.Array

class MarchResult(NamedTuple):
    cells: jax.Array  # i32[R, T]
    t0: jax.Array  # f32[R, T]
    t1: jax.Array  # f32[R, T]
    num_cells: jax.Array  # i32[R]

class MarchStream(NamedTuple):
    vids: jax.Array  # i32[R, T+4]
    pos: jax.Array  # i32[R, T+1, 4]
    bary: jax.Array  # f32[R, T+1, 4]

class FusedMarch(NamedTuple):
    cells: jax.Array  # i32[R, T]
    t1: jax.Array  # f32[R, T]
    t_entry: jax.Array  # f32[R]
    valid: jax.Array  # bool[R, T]
    num_valid: jax.Array  # i32[R]
    feats: Optional[jax.Array]  # f32[R, T+1, F]
    hit: jax.Array  # bool[R]
    overflow: jax.Array  # bool[R]
    stream: Optional[MarchStream] = ...
    @property
    def t0(self) -> jax.Array: ...

def endpoint_features(
    field: ArrayLike,
    stream: MarchStream,
    counts: Optional[ArrayLike] = ...,
    grad_budget: Optional[int] = ...,
    stream_dtype: Optional[str] = ...,
) -> jax.Array: ...

# ------------------------------------------------------------- traversal
def hull_intersect(
    mesh: TetrahedraMesh, origins: ArrayLike, directions: ArrayLike
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]: ...
def locate_points(
    mesh: TetrahedraMesh, points: ArrayLike, num_steps: int = ...
) -> jax.Array: ...
def march(
    mesh: TetrahedraMesh,
    origins: ArrayLike,
    directions: ArrayLike,
    max_steps: int = ...,
    near: float = ...,
    entry_walk_steps: int = ...,
) -> MarchResult: ...
def trace_rays(
    mesh: TetrahedraMesh,
    origins: ArrayLike,
    directions: ArrayLike,
    max_visited_cells: int = ...,
    near: float = ...,
) -> Dict[str, jax.Array]: ...

# ----------------------------------------------------------------- fused
def march_features(
    mesh: TetrahedraMesh,
    field: Optional[ArrayLike],
    origins: ArrayLike,
    directions: ArrayLike,
    max_steps: int = ...,
    entry_walk_steps: int = ...,
    hops: int = ...,
    use_occupancy: bool = ...,
    occ_threshold: float = ...,
    compact_stages: int = ...,
    use_skip: bool = ...,
    grad_stream_budget: Optional[int] = ...,
    occ_depth_cap: Optional[ArrayLike] = ...,
    stream_dtype: Optional[str] = ...,
    compact_ratio: float = ...,
) -> FusedMarch: ...
def ray_bounds(
    res: FusedMarch, near: float = ...
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]: ...
def biased_warp_range(
    res: FusedMarch,
    first: ArrayLike,
    num_kept: ArrayLike,
    nears: ArrayLike,
    fars: ArrayLike,
    samples: ArrayLike,
) -> jax.Array: ...
def sample_features(
    res: FusedMarch,
    distances: ArrayLike,
    ray_mask: ArrayLike,
    use_matmul: str | bool = ...,
    compute_dtype: Any = ...,
) -> Tuple[jax.Array, jax.Array]: ...

# -------------------------------------------------------------- matching
def match_samples(
    mesh: TetrahedraMesh,
    res: MarchResult,
    distances: ArrayLike,
    origins: ArrayLike,
    directions: ArrayLike,
) -> Dict[str, jax.Array]: ...
def find_visited_cells(
    num_visited_cells: ArrayLike,
    visited_cells: ArrayLike,
    barycentric_coordinates: ArrayLike,
    hit_distances: ArrayLike,
    vertex_indices: ArrayLike,
    distances: ArrayLike,
) -> Dict[str, jax.Array]: ...

# --------------------------------------------------------- interpolation
def interpolate_values(
    vertex_indices: ArrayLike,
    barycentric_coordinates: ArrayLike,
    field: ArrayLike,
) -> jax.Array: ...
def gather_uint32(indices: ArrayLike, values: ArrayLike) -> jax.Array: ...
def scatter_ema_uint32(
    target: ArrayLike, indices: ArrayLike, values: ArrayLike, decay: float
) -> jax.Array: ...

# ------------------------------------------------------------ barycentric
def barycentric_coordinates(
    vertices: ArrayLike, points: ArrayLike
) -> jax.Array: ...
def add_barycentrics_grad(
    barycentrics: ArrayLike, vertices: ArrayLike, points: ArrayLike
) -> jax.Array: ...

# ----------------------------------------------------------------- parity
def find_tetrahedra(
    mesh: TetrahedraMesh, points: ArrayLike, num_steps: int = ...
) -> Dict[str, jax.Array]: ...
def trace_rays_triangles(
    mesh: TetrahedraMesh,
    origins: ArrayLike,
    directions: ArrayLike,
    max_hits: int = ...,
) -> Dict[str, jax.Array]: ...
def update_occupancy(
    occupancy: ArrayLike,
    cell_indices: ArrayLike,
    values: ArrayLike,
    decay: float = ...,
) -> jax.Array: ...

# --------------------------------------------------------------- sampling
def stratified_bins(
    key: Optional[jax.Array],
    num_rays: int,
    num_samples: int,
    dtype: Any = ...,
) -> jax.Array: ...
def uniform_sample(
    key: Optional[jax.Array],
    nears: ArrayLike,
    fars: ArrayLike,
    num_samples: int,
) -> jax.Array: ...
def biased_warp(
    num_bounds: ArrayLike, bounds: ArrayLike, samples: ArrayLike
) -> jax.Array: ...
def pdf_sample(
    key: Optional[jax.Array],
    spacing_bins: ArrayLike,
    weights: ArrayLike,
    num_samples: int,
    include_original: bool = ...,
    histogram_padding: float = ...,
) -> jax.Array: ...

# -------------------------------------------------------------- rendering
def render_weights(densities: ArrayLike, deltas: ArrayLike) -> jax.Array: ...
def accumulate_along_rays(
    weights: ArrayLike, values: Optional[ArrayLike] = ...
) -> jax.Array: ...
def render_rgb_depth_acc(
    weights: ArrayLike,
    rgb: ArrayLike,
    distances: ArrayLike,
    background_rgb: Optional[ArrayLike] = ...,
    depth_method: str = ...,
    far: float | None = ...,
) -> Tuple[jax.Array, jax.Array, jax.Array]: ...

# --------------------------------------------------------------- encoding
def nerf_encoding(
    x: ArrayLike,
    num_frequencies: int,
    min_freq_exp: float = ...,
    max_freq_exp: float | None = ...,
    include_input: bool = ...,
) -> jax.Array: ...
