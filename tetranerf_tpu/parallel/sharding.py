"""Multi-chip scaling via ``jax.sharding`` — the DDP replacement.

The reference's only distribution strategy is torch
``DistributedDataParallel`` over NCCL (``tetranerf/nerfstudio/
pipeline.py:52-58``): each rank traces its own ray batch and gradients are
all-reduced. The TPU-native equivalent needs no communication code at all:

- rays (the batch axis) are sharded over the ``"data"`` mesh axis;
- parameters and the tetrahedra mesh tables are replicated;
- the jitted train step's mean-loss gradient induces the ``psum`` over ICI
  automatically through GSPMD partitioning.

On a multi-host pod the same code runs under ``jax.distributed`` with a
per-host input pipeline feeding each host's addressable shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = "data",
    model_shards: int = 1,
) -> Mesh:
    """Device mesh: 1-D data-parallel, or 2-D ``data x model``.

    ``model_shards > 1`` adds a ``"model"`` axis for tensor-parallel
    parameter sharding (the vertex feature field's feature axis — see
    :func:`state_shardings`); rays stay sharded over ``"data"`` and are
    replicated across ``"model"``.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    devices = np.asarray(devices)
    if model_shards <= 1:
        return Mesh(devices, (axis_name,))
    if devices.size % model_shards:
        raise ValueError(
            f"{devices.size} devices not divisible by "
            f"model_shards={model_shards}"
        )
    return Mesh(
        devices.reshape(-1, model_shards), (axis_name, "model")
    )


def state_shardings(mesh: Mesh, tree):
    """Per-leaf shardings for a params/TrainState pytree.

    On a mesh with a ``"model"`` axis, the tetrahedra feature field
    ``[V, F]`` — the model's only large parameter (64 floats per vertex,
    reference ``model.py:239-255``) — is sharded over its feature axis,
    along with its optimizer moments (RAdam's mu/nu mirror the params
    tree, so the same path test applies). Everything else (tiny MLPs,
    scalars) is replicated. GSPMD partitions the endpoint-feature gather
    column-wise and inserts the collectives at the MLP boundary.
    """
    rep = NamedSharding(mesh, P())
    if "model" not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: rep, tree)
    num_model = mesh.shape["model"]
    field_sh = NamedSharding(mesh, P(None, "model"))

    def leaf_sharding(path, leaf):
        is_field = any(
            getattr(p, "key", getattr(p, "name", None))
            == "tetrahedra_field"
            for p in path
        )
        if is_field and getattr(leaf, "ndim", 0) == 2:
            if leaf.shape[1] % num_model:
                # Silent replication here would quietly deliver zero
                # tensor parallelism (full-size field + moments per
                # device) — the exact blow-up the model axis exists to
                # avoid.
                raise ValueError(
                    f"field_dim={leaf.shape[1]} not divisible by "
                    f"model_shards={num_model}"
                )
            return field_sh
        return rep

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for per-ray batch arrays: leading axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    """Replicated sharding (parameters, mesh tables, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree of batch arrays with the leading axis sharded."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def host_batch_slice(
    global_batch_size: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> slice:
    """This host's contiguous slice of every globally-indexed ray batch.

    On a pod each process must feed only its own shard of the global
    batch (its addressable devices); with the batch axis sharded over a
    mesh whose device order is process-major (``jax.devices()`` order),
    process ``p`` owns rows ``[p*G/P, (p+1)*G/P)``. ``global_batch_size``
    must divide evenly by the process count (static shapes everywhere).
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    per = global_batch_size // n
    return slice(p * per, (p + 1) * per)


def make_global_batch(local_batch, mesh: Mesh, axis_name: str = "data"):
    """Assemble per-process local batch shards into global sharded arrays.

    ``local_batch`` is the pytree of THIS host's rows (produced with
    :func:`host_batch_slice`); the result is a pytree of global jax
    Arrays sharded over ``mesh``'s batch axis, ready for the jitted
    train step. Single-process: equivalent to :func:`shard_batch`.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local_batch
        )
    count = jax.process_count()

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * count,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree_util.tree_map(to_global, local_batch)


def put_replicated(tree, mesh: Mesh):
    """Replicate a host-identical pytree across the mesh — multi-process
    safe for arrays containing NaN.

    ``jax.device_put`` of a numpy array onto a multi-process sharding
    verifies the value is identical on every process with ``np.equal`` —
    which fails on bitwise-identical arrays that contain NaN (NaN !=
    NaN). The packed march table legitimately carries NaNs: boundary
    neighbors are ``-1`` bit-cast to f32 (0xFFFFFFFF is a NaN pattern).
    Single-process this is exactly ``device_put``; multi-process it
    builds each leaf via ``make_array_from_callback`` (no value check —
    the tables are deterministic on every host by construction)."""
    sharding = replicate(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree_util.tree_map(put, tree)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host training (pod slices over DCN).

    Call once per host before any other jax use; returns the process
    index. With no arguments, autodetects from the TPU environment
    (``jax.distributed`` reads the runtime metadata). Each host then
    feeds its addressable shard of every ray batch; the rest of the code
    is unchanged — GSPMD handles cross-host collectives.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()
