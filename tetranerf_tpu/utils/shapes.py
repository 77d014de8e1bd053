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


def inner_bound(crossings, margin: float = 1.15) -> int:
    """Quantile-bucket inner bound from an observed chunk crossing
    count: a SMALL margin, rounded up to a multiple of 8.

    Unlike the main traversal bound (``rounded_bound``), bucket bounds
    are sized from the sorted batch's own quantile chunks — the
    bucketing sorts future batches by the same key, so the only noise a
    bucket bound must absorb is batch-to-batch quantile jitter (a few
    percent at thousands of rays per bucket), not distribution shift.
    The coarse ``BOUND_GRID`` + 1.5x margin left the shading stages
    ~30% over-padded on the warm bench distribution (measured: bounds
    (96, 96, 192, 256) for chunk maxes (49, 57, 101, 217); exact-cover
    bounds at 1.15x ran 92.1 -> 68.9 ms/step at 8K rays with K=8).
    Truncation self-heals: growth proposals are accepted immediately at
    the next retune and surfaced via ``overflow_rays`` meanwhile."""
    b = max(16.0, float(crossings) * margin)
    return int(-(-b // 8) * 8)


def scaled_budget(base: int, t: int, t_full: int, floor: int = 16) -> int:
    """Sample budget for a depth bound ``t`` out of ``t_full``: scales
    the base budget with the bound so per-crossing sample density never
    drops below the full budget's, grid-rounded, floored at ``floor``.
    ``base == 0`` (fine round disabled) stays 0."""
    if not base:
        return base
    frac = t / max(t_full, 1)
    return min(base, grid_ceil(max(floor, base * frac)))
