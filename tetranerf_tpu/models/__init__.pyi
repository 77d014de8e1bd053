from pathlib import Path
from typing import Any, Dict, Literal, NamedTuple, Optional, Union

import jax
import numpy as np

from ..geometry.mesh import TetrahedraMesh

ArrayLike = np.ndarray | jax.Array
Params = Dict[str, Any]

class RayBundle(NamedTuple):
    origins: jax.Array  # f32[R, 3]
    directions: jax.Array  # f32[R, 3]
    camera_indices: Optional[jax.Array] = ...  # i32[R]

class TetrahedraNerfConfig:
    tetrahedra_path: Optional[Path]
    num_tetrahedra_vertices: Optional[int]
    num_tetrahedra_cells: Optional[int]
    max_intersected_triangles: int
    num_samples: int
    num_fine_samples: int
    use_biased_sampler: bool
    field_dim: int
    num_color_layers: int
    num_density_layers: int
    hidden_size: int
    input_fourier_frequencies: int
    initialize_colors: bool
    use_gradient_scaling: bool
    background_color: Literal["random", "last_sample", "black", "white"]
    appearance_embed_dim: int
    use_occupancy_field: bool
    occupancy_update_every: int
    occupancy_refresh_every: int
    occupancy_threshold: float
    occupancy_decay: float
    occupancy_retune_every: int
    skip_grid_resolution: int
    skip_grid_eps: float
    occupancy_retune_mode: Literal["transmittance", "march"]
    occupancy_retune_percentile: float
    occ_cap_percentile: float
    compute_dtype: str
    interp_mode: str
    remat_mlps: Union[bool, Literal["auto"]]
    fused_mlps: bool
    ray_buckets: int
    bucket_short_steps: Optional[int]
    bucket_bound_margin: float
    bucket_adaptive_samples: bool
    traversal_hops: int
    march_compaction: int
    march_compact_ratio: float
    grad_stream_budget_per_ray: Optional[int]
    field_stream_dtype: str
    far_plane: float
    depth_method: Literal["median", "expected"]
    def __init__(
        self,
        tetrahedra_path: Optional[Path] = ...,
        num_tetrahedra_vertices: Optional[int] = ...,
        num_tetrahedra_cells: Optional[int] = ...,
        max_intersected_triangles: int = ...,
        num_samples: int = ...,
        num_fine_samples: int = ...,
        use_biased_sampler: bool = ...,
        field_dim: int = ...,
        num_color_layers: int = ...,
        num_density_layers: int = ...,
        hidden_size: int = ...,
        input_fourier_frequencies: int = ...,
        initialize_colors: bool = ...,
        use_gradient_scaling: bool = ...,
        background_color: str = ...,
        appearance_embed_dim: int = ...,
        use_occupancy_field: bool = ...,
        occupancy_update_every: int = ...,
        occupancy_refresh_every: int = ...,
        occupancy_threshold: float = ...,
        occupancy_decay: float = ...,
        occupancy_retune_every: int = ...,
        skip_grid_resolution: int = ...,
        skip_grid_eps: float = ...,
        occupancy_retune_mode: Literal["transmittance", "march"] = ...,
        occupancy_retune_percentile: float = ...,
        occ_cap_percentile: float = ...,
        compute_dtype: str = ...,
        interp_mode: str = ...,
        remat_mlps: Union[bool, Literal["auto"]] = ...,
        fused_mlps: bool = ...,
        ray_buckets: int = ...,
        bucket_short_steps: Optional[int] = ...,
        bucket_bound_margin: float = ...,
        bucket_adaptive_samples: bool = ...,
        traversal_hops: int = ...,
        march_compaction: int = ...,
        march_compact_ratio: float = ...,
        grad_stream_budget_per_ray: Optional[int] = ...,
        field_stream_dtype: str = ...,
        far_plane: float = ...,
        depth_method: str = ...,
    ) -> None: ...

class TetraNerf:
    config: TetrahedraNerfConfig
    mesh: TetrahedraMesh
    num_train_images: int
    def __init__(
        self,
        config: TetrahedraNerfConfig,
        mesh: TetrahedraMesh,
        num_train_images: int = ...,
    ) -> None: ...
    def init_params(
        self, key: jax.Array, point_colors: Optional[ArrayLike] = ...
    ) -> Params: ...
    def get_outputs(
        self,
        params: Params,
        rays: RayBundle,
        rng: Optional[jax.Array] = ...,
        train: bool = ...,
        mesh: Optional[TetrahedraMesh] = ...,
        max_steps: Optional[int] = ...,
        short_steps: Optional[int] = ...,
        num_samples: Optional[int] = ...,
        num_fine_samples: Optional[int] = ...,
        cached_march: Optional[Any] = ...,
        occ_depth_cap: Optional[ArrayLike] = ...,
        bucket_steps: Optional[tuple] = ...,
    ) -> Dict[str, jax.Array]: ...
    def loss(
        self, outputs: Dict[str, jax.Array], batch: Any
    ) -> jax.Array: ...
