"""Native C++ geometry library tests (skipped when not built)."""

import numpy as np
import pytest

native = pytest.importorskip("tetranerf_tpu.geometry.native")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="csrc/libtetra_geom.so not built"
)


def test_native_adjacency_matches_scipy(ball_points):
    from scipy.spatial import Delaunay

    tri = Delaunay(ball_points)
    cells = tri.simplices.astype(np.int32)
    nb = native.build_adjacency(cells)
    np.testing.assert_array_equal(nb, tri.neighbors.astype(np.int32))


def test_native_adjacency_rejects_overshared():
    cells = np.array([[0, 1, 2, 3], [0, 1, 2, 4], [0, 1, 2, 5]], np.int32)
    with pytest.raises(ValueError):
        native.build_adjacency(cells)


def test_native_spacing_matches_bruteforce(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sqrt(np.sort(d2, axis=1)[:, :6]).mean()
    got = native.average_spacing(pts, 6)
    assert got == pytest.approx(float(ref), rel=1e-6)


def test_native_spacing_line():
    pts = np.stack(
        [np.arange(10) * 2.0, np.zeros(10), np.zeros(10)], axis=-1
    ).astype(np.float32)
    got = native.average_spacing(pts, 2)
    assert 2.0 <= got <= 2.5
