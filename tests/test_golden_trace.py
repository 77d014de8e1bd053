"""Golden-trace regression test for the marcher.

The reference pins its trickiest device logic (hit dedupe/pairing) to
captured real traces replayed in pure Python (``tests/test_sort.py``,
SURVEY §4). Here the captured artifact is the marcher's own interval
output on a fixed mesh + ray set (``tests/assets/golden_march.npz``): any
change to traversal logic that alters cell sequences or interval
distances fails this test and must consciously regenerate the asset.
"""

from pathlib import Path

import numpy as np
import pytest

from tetranerf_tpu.geometry import build_mesh
from tetranerf_tpu.ops import march, march_features

ASSET = Path(__file__).parent / "assets" / "golden_march.npz"


@pytest.fixture(scope="module")
def golden():
    with np.load(ASSET) as data:
        return {k: data[k] for k in data.files}


def test_march_matches_golden_trace(golden):
    mesh = build_mesh(golden["points"])
    res = march(mesh, golden["origins"], golden["directions"], max_steps=96)
    np.testing.assert_array_equal(
        np.asarray(res.num_cells), golden["num_cells"]
    )
    num = golden["num_cells"]
    for r in range(len(num)):
        n = num[r]
        np.testing.assert_array_equal(
            np.asarray(res.cells[r, :n]), golden["cells"][r, :n]
        )
        np.testing.assert_allclose(
            np.asarray(res.t0[r, :n]), golden["t0"][r, :n], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(res.t1[r, :n]), golden["t1"][r, :n], atol=1e-5
        )


def test_fused_matches_golden_trace(golden):
    mesh = build_mesh(golden["points"])
    res = march_features(
        mesh, None, golden["origins"], golden["directions"], max_steps=96
    )
    np.testing.assert_array_equal(
        np.asarray(res.num_valid), golden["num_cells"]
    )
    num = golden["num_cells"]
    for r in range(len(num)):
        n = num[r]
        np.testing.assert_array_equal(
            np.asarray(res.cells[r, :n]), golden["cells"][r, :n]
        )
