"""Static-shape policy helpers shared by the trainer, the model's
bucketed shading and the render benchmarks.

Every distinct traversal bound / sample budget is a distinct static
shape — a full XLA recompile of the step (~minutes on slow hosts) — so
all tuned values land on ONE coarse grid that the persistent compile
cache can reuse across runs and callers.
"""

from __future__ import annotations

import numpy as np

BOUND_GRID = (16, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768, 1024)


def grid_ceil(n) -> int:
    """Smallest ``BOUND_GRID`` value >= n (shared by bound retuning,
    bucket bounds, adaptive sample budgets and the depth-sorted render
    cache so static shapes stay deduplicated)."""
    for g in BOUND_GRID:
        if g >= n:
            return g
    return int(np.ceil(n / 256)) * 256


def rounded_bound(crossings) -> int:
    """Traversal bound from an observed crossing count: 1.5x margin,
    rounded UP to the coarse grid."""
    return grid_ceil(max(16.0, float(crossings) * 1.5))


def scaled_budget(base: int, t: int, t_full: int, floor: int = 16) -> int:
    """Sample budget for a depth bound ``t`` out of ``t_full``: scales
    the base budget with the bound so per-crossing sample density never
    drops below the full budget's, grid-rounded, floored at ``floor``.
    ``base == 0`` (fine round disabled) stays 0."""
    if not base:
        return base
    frac = t / max(t_full, 1)
    return min(base, grid_ceil(max(floor, base * frac)))
