"""Worker for the 2-process multi-host test (run via subprocess).

Each process owns 4 virtual CPU devices (8 global), feeds ONLY its
host_batch_slice of a deterministic global batch, assembles global
arrays with make_global_batch, and evaluates a jitted global reduction —
the cross-process collective path a pod uses (gloo CPU collectives
standing in for DCN).

Usage: python tests/multihost_worker.py <process_id> <port>
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp
import numpy as np


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=process_id,
    )
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tetranerf_tpu.parallel.sharding import (
        batch_sharding,
        host_batch_slice,
        make_global_batch,
        make_mesh,
        replicate,
    )

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, len(jax.devices())

    mesh = make_mesh()
    global_batch = {
        "x": np.arange(64, dtype=np.float32).reshape(16, 4) + 1.0,
        "y": np.arange(16, dtype=np.float32) * 0.5,
    }
    sl = host_batch_slice(16)
    local = {k: v[sl] for k, v in global_batch.items()}
    gbatch = make_global_batch(local, mesh)
    assert gbatch["x"].shape == (16, 4), gbatch["x"].shape

    @jax.jit
    def reduce_fn(b):
        return jnp.mean(b["x"]) + jnp.sum(b["y"])

    out = jax.jit(reduce_fn, out_shardings=replicate(mesh))(gbatch)
    expected = float(
        np.mean(global_batch["x"]) + np.sum(global_batch["y"])
    )
    got = float(out)
    assert abs(got - expected) < 1e-5, (got, expected)

    # dp x tp across hosts: 4x2 mesh, a field [V, F] sharded over its
    # feature axis (model), a batch-sharded index gather + global mean —
    # the sharded-field train-step pattern.
    from tetranerf_tpu.parallel.sharding import state_shardings

    mesh2 = make_mesh(model_shards=2)
    assert dict(mesh2.shape) == {"data": 4, "model": 2}, mesh2.shape
    field = np.arange(48, dtype=np.float32).reshape(6, 8)
    params = {"tetrahedra_field": field}
    sh = state_shardings(mesh2, params)
    params = jax.device_put(params, sh)
    assert params["tetrahedra_field"].sharding.shard_shape((6, 8)) == (6, 4)
    vids = np.array([0, 5, 2, 3, 1, 4, 0, 2], np.int32)
    gvids = make_global_batch(
        {"v": vids[host_batch_slice(8)]}, mesh2
    )["v"]

    @jax.jit
    def field_mean(p, v):
        return jnp.mean(p["tetrahedra_field"][v])

    got2 = float(
        jax.jit(field_mean, out_shardings=replicate(mesh2))(params, gvids)
    )
    expected2 = float(np.mean(field[vids]))
    assert abs(got2 - expected2) < 1e-5, (got2, expected2)

    # Full flagship train-step path across processes: bucketed shading
    # (ray_buckets=2) + occupancy termination + EMA update + the
    # transmittance retune, each process feeding ONLY its
    # host_batch_slice — the exact pod code path (make_global_batch's
    # process_count>1 branch) for every jitted step AND every probe.
    from tetranerf_tpu.geometry import build_mesh
    from tetranerf_tpu.models import TetraNerf, TetrahedraNerfConfig
    from tetranerf_tpu.training import Trainer, tetranerf_preset
    from tetranerf_tpu.utils import (
        make_camera_scene,
        camera_ray_targets,
        sample_camera_rays,
    )

    points, colors = make_camera_scene(600, seed=3)
    tmesh = build_mesh(points)
    config = tetranerf_preset()
    config.model = TetrahedraNerfConfig(
        num_samples=8,
        num_fine_samples=8,
        max_intersected_triangles=64,
        field_dim=8,
        hidden_size=16,
        compute_dtype="float32",
        use_occupancy_field=True,
        occupancy_update_every=2,
        occupancy_retune_every=3,
        occupancy_refresh_every=0,
        ray_buckets=2,
    )
    config.num_model_shards = 2  # dp=4 x tp=2 across the 2 processes
    model = TetraNerf(config.model, tmesh)
    trainer = Trainer(config, model, point_colors=colors)
    rng = np.random.default_rng(7)  # same seed -> same GLOBAL batch
    losses = []
    for step in range(4):
        o, d = sample_camera_rays(rng, 64)
        rgb = camera_ray_targets(o, d)
        sl = host_batch_slice(64)
        m = trainer.train_step(
            {"origins": o[sl], "directions": d[sl], "rgb": rgb[sl]}
        )
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert trainer._occ is not None  # EMA update ran multi-process

    print(
        f"OK process={process_id} value={got} tp={got2} "
        f"train={losses[-1]:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
