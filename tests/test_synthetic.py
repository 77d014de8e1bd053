"""The two bench scenes (``utils/synthetic.py``) stay valid inputs.

The sphere scene is the crossing-tail stressor; the camera scene is the
reference's COLMAP operating point (objects + sparse far background ->
mostly-empty hull, where skip/termination must pay; round-3 verdict
next-step #6). ``bench.py --scene camera`` and ``warm_snapshot.py``
depend on these invariants; this locks them into the suite.
"""

import numpy as np
import pytest

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.models import TetraNerf, TetrahedraNerfConfig
from tetranerf_tpu.training import Trainer, tetranerf_preset
from tetranerf_tpu.utils import (
    camera_ray_targets,
    make_camera_scene,
    sample_camera_rays,
)


def test_camera_scene_shape_and_structure():
    points, colors = make_camera_scene(1000, seed=0)
    assert points.shape == (len(colors), 3)
    assert colors.shape[1] == 4 and colors.dtype == np.uint8
    r = np.linalg.norm(points, axis=1)
    # Objects cluster well inside the far background shell: the hull is
    # mostly empty space (the property the scene exists to model).
    assert (r > 4.0).sum() >= 0.03 * len(points)  # background stretchers
    assert (r < 3.0).sum() >= 0.85 * len(points)  # object surfaces


def test_camera_rays_hit_objects_and_targets_are_colored():
    rng = np.random.default_rng(0)
    o, d = sample_camera_rays(rng, 256)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    rgb = camera_ray_targets(o, d)
    assert rgb.shape == (256, 3)
    hits = (rgb < 0.999).any(axis=1)
    assert hits.mean() > 0.3  # aimed rays frequently hit an object


def test_train_step_runs_on_camera_scene():
    points, colors = make_camera_scene(800, seed=1)
    mesh = build_mesh(points)
    config = tetranerf_preset()
    config.model = TetrahedraNerfConfig(
        num_samples=8,
        num_fine_samples=8,
        max_intersected_triangles=64,
        field_dim=8,
        hidden_size=16,
        compute_dtype="float32",
        use_occupancy_field=True,
        occupancy_retune_every=0,
        ray_buckets=2,
    )
    model = TetraNerf(config.model, mesh)
    trainer = Trainer(config, model, point_colors=colors)
    rng = np.random.default_rng(2)
    o, d = sample_camera_rays(rng, 64)
    m = trainer.train_step(
        {"origins": o, "directions": d, "rgb": camera_ray_targets(o, d)}
    )
    assert np.isfinite(float(m["loss"]))
