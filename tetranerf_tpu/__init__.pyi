"""Typed top-level surface — makes the runtime ``__getattr__`` lazy
re-exports statically visible (the reference ships ``py.typed`` + a
``.pyi`` for its extension layer, ``setup.py:135`` + ``MANIFEST.in``)."""

from .geometry import TetrahedraMesh as TetrahedraMesh
from .geometry import build_mesh as build_mesh
from .geometry import triangulate as triangulate
from .models import RayBundle as RayBundle
from .models import TetraNerf as TetraNerf
from .models import TetrahedraNerfConfig as TetrahedraNerfConfig
from .training import Trainer as Trainer
from .training import tetranerf_original_preset as tetranerf_original_preset
from .training import tetranerf_preset as tetranerf_preset

__version__: str
