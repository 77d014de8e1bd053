"""Geometry-core tests.

Mirrors the invariants of the reference's ``tests/test_triangulation.py``
(shape ``[C, 4]``, max index bound, cell-count lower bound; average-spacing
sanity on a line of points) using procedurally generated clouds instead of
the binary asset.
"""

import numpy as np
import pytest

from tetranerf_tpu.geometry import (
    find_average_spacing,
    read_ply,
    triangulate,
    write_ply,
)


def test_triangulate_ball(ball_points):
    cells = triangulate(ball_points)
    assert cells.ndim == 2 and cells.shape[1] == 4
    assert cells.dtype == np.int32
    assert cells.max() == len(ball_points) - 1
    assert cells.min() >= 0
    # A Delaunay tetrahedralization of n generic points has ~6n cells.
    assert len(cells) > 2 * len(ball_points)
    # No duplicate vertices within a cell.
    sorted_cells = np.sort(cells, axis=1)
    assert (np.diff(sorted_cells, axis=1) > 0).all()


def test_triangulate_fills_hull(ball_points):
    """Total cell volume must equal the convex hull volume."""
    from scipy.spatial import ConvexHull

    cells = triangulate(ball_points)
    v = ball_points[cells]
    vols = np.abs(np.linalg.det(v[:, 1:] - v[:, :1])) / 6.0
    hull_volume = ConvexHull(ball_points).volume
    assert np.isclose(vols.sum(), hull_volume, rtol=1e-6)


def test_triangulate_rejects_bad_input():
    with pytest.raises(ValueError):
        triangulate(np.zeros((3, 3)))
    with pytest.raises(ValueError):
        triangulate(np.zeros((10, 2)))


def test_find_average_spacing():
    # Points spaced 2.0 apart on a line: each point's 2 nearest neighbors
    # are at distances 2 and 2 (interior) or 2 and 4 (endpoints).
    pts = np.stack(
        [np.arange(10) * 2.0, np.zeros(10), np.zeros(10)], axis=-1
    )
    spacing = find_average_spacing(pts, num_neighbors=2)
    assert 2.0 <= spacing <= 2.5


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    colors = rng.integers(0, 256, size=(100, 3), dtype=np.uint8)
    path = tmp_path / "cloud.ply"
    write_ply(path, pts, colors)
    rpts, rcolors = read_ply(path)
    np.testing.assert_allclose(rpts, pts, rtol=1e-6)
    np.testing.assert_array_equal(rcolors, colors)


def test_ply_ascii(tmp_path):
    text = (
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0 0 0\n1 2 3\n"
    )
    path = tmp_path / "ascii.ply"
    path.write_text(text)
    pts, colors = read_ply(path)
    np.testing.assert_allclose(pts, [[0, 0, 0], [1, 2, 3]])
    assert colors is None


def test_tetrahedra_io_roundtrip(tmp_path, ball_points):
    from tetranerf_tpu.geometry import load_tetrahedra, save_tetrahedra

    cells = triangulate(ball_points)
    colors = np.random.default_rng(0).integers(
        0, 256, size=(len(ball_points), 3), dtype=np.uint8
    )
    for name in ["tetra.npz", "tetra.th"]:
        path = tmp_path / name
        save_tetrahedra(
            path, vertices=ball_points, cells=cells, colors=colors
        )
        data = load_tetrahedra(path)
        np.testing.assert_allclose(
            data["vertices"], ball_points.astype(np.float32), rtol=1e-6
        )
        np.testing.assert_array_equal(data["cells"], cells)
        assert data["colors"].shape == (len(ball_points), 4)
        np.testing.assert_array_equal(data["colors"][:, :3], colors)
        np.testing.assert_array_equal(data["colors"][:, 3], 255)
