"""TPU-native Tetra-NeRF.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
jkulhanek/tetra-nerf (ICCV 2023, arXiv:2304.09987): radiance fields
represented on a Delaunay tetrahedralization of an input point cloud.

The reference implementation is CUDA/OptiX/libtorch; this package is a
TPU-first redesign:

- OptiX ray tracing (anyhit collect + bitonic sort + interval pairing) is
  replaced by a neighbor-marching traversal over a precomputed cell
  adjacency table, which emits sorted entry/exit intervals directly
  (``tetranerf_tpu.ops.traversal``).
- CGAL Delaunay is replaced by Qhull (scipy) plus a native C++ mesh
  preprocessing library (``csrc/``) for adjacency/hull extraction.
- CUDA interpolation/scatter kernels are replaced by XLA gathers and
  ``segment_sum`` with custom VJPs (``tetranerf_tpu.ops.interpolation``).
- torch DDP is replaced by ``shard_map`` data parallelism over a
  ``jax.sharding.Mesh`` (``tetranerf_tpu.parallel``).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level re-exports (keeps `import tetranerf_tpu` light)."""
    if name in ("build_mesh", "triangulate", "TetrahedraMesh"):
        from . import geometry

        return getattr(geometry, name)
    if name in ("TetraNerf", "TetrahedraNerfConfig", "RayBundle"):
        from . import models

        return getattr(models, name)
    if name in ("Trainer", "tetranerf_preset", "tetranerf_original_preset"):
        from . import training

        return getattr(training, name)
    raise AttributeError(name)
