from .config import TetrahedraNerfConfig
from .tetra_nerf import RayBundle, TetraNerf

__all__ = ["TetrahedraNerfConfig", "TetraNerf", "RayBundle"]
