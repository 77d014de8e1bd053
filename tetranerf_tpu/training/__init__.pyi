from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
import optax

from ..geometry.mesh import TetrahedraMesh
from ..models import TetraNerf, TetrahedraNerfConfig

Batch = Dict[str, np.ndarray]
Metrics = Dict[str, jax.Array]

class TrainConfig:
    method_name: str
    model: TetrahedraNerfConfig
    max_num_iterations: int
    train_num_rays_per_batch: int
    eval_num_rays_per_batch: int
    steps_per_save: int
    steps_per_eval_batch: int
    steps_per_eval_image: int
    steps_per_eval_all_images: int
    learning_rate: float
    learning_rate_final: float
    lr_max_steps: int
    seed: int
    output_dir: Optional[str]
    num_data_shards: Optional[int]
    num_model_shards: int
    def __init__(self, *args: Any, **kwargs: Any) -> None: ...

def tetranerf_preset(**overrides: Any) -> TrainConfig: ...
def tetranerf_original_preset(**overrides: Any) -> TrainConfig: ...

class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    def replace(self, **kwargs: Any) -> "TrainState": ...

def make_optimizer(config: TrainConfig) -> optax.GradientTransformation: ...
def make_train_step(
    model: TetraNerf,
    optimizer: optax.GradientTransformation,
    max_steps: Optional[int] = ...,
    bucket_steps: Optional[tuple] = ...,
) -> Callable[..., Any]: ...

class Trainer:
    config: TrainConfig
    model: TetraNerf
    state: TrainState
    mesh_tables: TetrahedraMesh
    tuned_max_steps: Optional[int]
    tuned_bucket_steps: Optional[tuple]
    @property
    def tuned_short_steps(self) -> Optional[int]: ...
    @property
    def march_version(self) -> int: ...
    def __init__(
        self,
        config: TrainConfig,
        model: TetraNerf,
        *,
        point_colors: Optional[np.ndarray] = ...,
        mesh_devices: Optional[int] = ...,
        devices: Any = ...,
        auto_tune_steps: bool = ...,
    ) -> None: ...
    def tune_traversal_steps(self, batch: Batch) -> int: ...
    def retune_with_occupancy(self, batch: Batch) -> int: ...
    def retune_with_transmittance(self, batch: Batch) -> int: ...
    def refresh_occupancy(self) -> None: ...
    def update_occupancy(self, batch: Batch) -> None: ...
    def train_step(self, batch: Batch) -> Metrics: ...
    def eval_batch(self, batch: Batch) -> Dict[str, jax.Array]: ...
    def render_rays(
        self,
        origins: np.ndarray,
        directions: np.ndarray,
        chunk: int = ...,
        num_samples: Optional[int] = ...,
        num_fine_samples: Optional[int] = ...,
    ) -> Dict[str, np.ndarray]: ...
    def cache_camera(
        self,
        origins: np.ndarray,
        directions: np.ndarray,
        chunk: int = ...,
        sort_by_depth: bool = ...,
    ) -> Dict[str, Any]: ...
    def adaptive_budget(
        self,
        bounds: Any,
        ci: int,
        num_samples: Optional[int] = ...,
        num_fine_samples: Optional[int] = ...,
    ) -> Any: ...
    def render_cached(
        self,
        cache: Dict[str, Any],
        num_samples: Optional[int] = ...,
        num_fine_samples: Optional[int] = ...,
        adaptive_samples: bool = ...,
    ) -> Dict[str, np.ndarray]: ...
    def save_checkpoint(self, path: str) -> None: ...
    def restore_checkpoint(self, path: str) -> None: ...
    def fit(
        self,
        next_batch: Callable[[int], Batch],
        num_iterations: Optional[int] = ...,
        log_every: int = ...,
        log_fn: Callable[[str], None] = ...,
        eval_fn: Optional[Callable[[int, "Trainer"], None]] = ...,
        eval_every: Optional[int] = ...,
        prefetch: int = ...,
    ) -> TrainState: ...
