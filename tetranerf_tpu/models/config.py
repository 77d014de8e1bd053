"""Model configuration, mirroring the reference's ``TetrahedraNerfConfig``
(``tetranerf/nerfstudio/model.py:70-107``) field-for-field, plus
TPU-specific knobs (compute dtype, traversal bounds).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Literal, Optional, Union


@dataclasses.dataclass
class TetrahedraNerfConfig:
    tetrahedra_path: Optional[Path] = None
    num_tetrahedra_vertices: Optional[int] = None
    num_tetrahedra_cells: Optional[int] = None

    max_intersected_triangles: int = 512
    """Traversal step bound per ray. Unlike the reference
    (``src/py_binding.cpp:44-47``) this need not be a power of two — the
    marcher emits sorted intervals without a bitonic sort."""
    num_samples: int = 256
    num_fine_samples: int = 256
    use_biased_sampler: bool = False
    field_dim: int = 64

    num_color_layers: int = 1
    num_density_layers: int = 3
    hidden_size: int = 128

    input_fourier_frequencies: int = 0

    initialize_colors: bool = True

    use_gradient_scaling: bool = False
    """Scale gradients down for points close to the camera (Radiance Field
    Gradient Scaling; reference ``model.py:195-205, 625-630``)."""
    background_color: Literal["random", "last_sample", "black", "white"] = "white"

    appearance_embed_dim: int = 0
    """Per-image appearance embedding dimension (0 = disabled)."""

    use_occupancy_field: bool = False
    """Maintain an EMA per-cell density estimate and use it for
    transmittance-based early termination in the march: the march
    accumulates ``sigma * dt`` over crossed cells (exact per-ray
    chords) and stops once the estimated transmittance drops below
    ``occupancy_threshold`` (the reference registers an occupancy
    buffer and ships a scatter-EMA kernel for it but never wires either
    into the forward pass; ``model.py:256-265``,
    ``src/tetrahedra_tracer.cu:55-113``)."""
    occupancy_update_every: int = 16
    """Train steps between ray-based occupancy EMA updates (per-interval
    MEAN sample density — the chord-average the march consumes;
    use_occupancy_field); 0 disables."""
    occupancy_refresh_every: int = 64
    """Train steps between full-coverage occupancy refreshes: the
    density MLP is evaluated at EVERY cell's centroid (exact barycentric
    feature mean — no rays, no sampling holes) and maxed into the EMA.
    Warms the whole field within one refresh once the surface has
    formed, instead of waiting for stochastic ray coverage. 0 disables."""
    occupancy_threshold: float = 1e-3
    """Terminate a ray when its estimated transmittance
    ``exp(-sum sigma * dt)`` falls below this."""
    occupancy_decay: float = 0.95
    """EMA decay for the per-cell density estimate."""
    occupancy_retune_every: int = 256
    """Steps between occupancy-aware traversal-bound retunes (0 =
    never). Once the occupancy EMA is warm, rays terminate long before
    the cold-probe bound; re-probing max crossings WITH termination
    active lets the trainer shrink the static bound ``T`` — which
    shrinks every [R, T]-shaped stage of the step (march, interval
    matching, endpoint buffers, the backward scatter stream), not just
    the march. The probe keeps the same 1.5x safety margin and GROWS
    the bound again if it ever saturates (so truncation self-heals);
    overflow is still surfaced via the ``overflow_rays`` metric."""
    skip_grid_resolution: int = 0
    """Empty-space skip grid resolution G (0 = disabled). With
    ``use_occupancy_field``, the trainer voxelizes the occupancy EMA
    onto a ``[G, G, G]`` free-space distance grid at every occupancy
    refresh; the march sphere-traces through it from the hull entry, so
    empty spans cost one grid gather per ~``max_skip_voxels`` voxels
    instead of one row gather per crossed cell, and rays that miss all
    estimated density never march at all (``ops/skip_grid.py``; the
    reference's OptiX BVH culls empty space the same way for free,
    ``src/tetrahedra_tracer.cpp:285-332``)."""
    skip_grid_eps: float = 1e-3
    """Density threshold below which a voxel counts as empty for
    skipping. A skipped span of length L forfeits at most ``eps * L``
    optical depth — keep it well under ``-log(1 -
    occupancy_threshold)/scene_size``."""
    occupancy_retune_mode: Literal["transmittance", "march"] = "transmittance"
    """How the periodic retune measures per-ray crossing needs.
    ``"transmittance"`` (default) probes the model's OWN optical depth
    at full sample resolution — the bound then truncates only content
    behind an (estimated-density-independent) ``occupancy_threshold``
    of remaining light, so sizing is quality-safe even when the EMA is
    miscalibrated. ``"march"`` probes the EMA-terminated march itself
    (crossings until the ESTIMATED depth exhausts), which couples bound
    safety to EMA calibration."""
    occupancy_retune_percentile: float = 100.0
    """Crossing-count percentile the occupancy retune sizes the bound
    from. 100 = the batch max: no ray is ever truncated, but a tiny
    population of deep rays (rays that graze the hull and miss all
    occupied geometry march their full hull chord) pins the bound for
    the whole batch. 99 sizes every [R, T] stage for the hit-ray
    distribution and truncates the deep tail's FAR intervals —
    contributions there are behind the termination threshold or empty
    space, and every truncated ray is still counted in
    ``overflow_rays``."""
    occ_cap_margin: float = 1.2
    """Headroom factor on the calibrated march-termination depth cap.
    The estimator's bias grows as the surface sharpens, so the cap must
    survive the drift WITHIN a retune interval (measured: the
    calibrated cap rose ~15% per 128-step interval on the 20k
    image-path run); the trainer additionally takes the max over the
    last 3 probes. Cost of a larger margin: deeper march overshoot
    before termination — throughput, never quality."""
    occ_cap_percentile: float = 99.9
    """``est_at`` percentile the march-termination depth cap calibrates
    to (``Trainer.retune_with_transmittance``: cap = ``occ_cap_margin``
    x this percentile of the ESTIMATED depth at each probe ray's TRUE
    exhaustion point, then maxed over the last 3 probes — the drift
    guard). 99.9 = the round-3 quality-first setting: fewer
    than 0.1% of rays can terminate with more than ``threshold``
    transmittance left. Lower percentiles trade bounded light loss for
    march length: at 99, rays in the 99-99.9 band are cut with
    remaining transmittance <= exp(-(floor - tail_est/bias)) — a few x
    threshold at calibration time, re-measured every retune — while the
    MEDIAN ray stops marching the estimator's full worst-case overshoot
    past its own exhaustion (measured: march p50 118 crossings at the
    p99.9 cap vs 59 truly needed on the warm bench scene)."""

    # --- TPU-specific additions (no reference counterpart) ---
    compute_dtype: str = "bfloat16"
    """MLP compute dtype; parameters stay float32."""
    interp_mode: str = "matmul"
    """Endpoint-feature interpolation backend for ``sample_features``:
    ``"matmul"`` builds the two-nonzero one-hot in compute_dtype and
    rides the MXU, with the backward reusing it as a residual (no
    rebuild); ``"pallas"`` builds it per-ray in VMEM (less HBM, but its
    backward reconstructs the one-hot — slower in training); ``"gather"``
    uses take-along-axis (slow on TPU, debugging only)."""
    remat_mlps: Union[bool, Literal["auto"]] = "auto"
    """Recompute MLP activations in the backward pass instead of saving
    them — they are the step's largest residuals ([R, S, 128] each; an
    OOM at 32K rays) while their recompute is cheap (the MXU is mostly
    idle). ``"auto"`` (default) remats only above 4M (ray, sample)
    points per pass: below that the residuals fit comfortably and
    skipping the recompute saves a measured ~5 ms/step at [8K, 257]."""
    fused_mlps: bool = False
    """Run the base/density/color MLP stack as one fully-fused Pallas
    kernel (weights resident in VMEM, activations never touch HBM —
    the tiny-cuda-nn trick). Falls back to the XLA path when
    ``input_fourier_frequencies > 0``. Measured ~3% SLOWER end-to-end
    than the XLA remat path on v5e (benchmarks/ab_fused_compact.py:
    193.4 vs 188.0 ms/step at 8192 rays) — XLA's own fusion of these
    tiny matmul chains is already HBM-efficient; kept for hardware
    where the balance differs."""
    ray_buckets: int = 1
    """1 = every [·, T]-shaped stage pads to the batch-max bound; K >= 2
    = one geometry march, then rays sort by their TRUE crossing count,
    split into K equal quantile buckets, and bucket k's downstream
    stages (endpoint features, the [R, S, T] sample-interval matmuls,
    their backwards) run at its own tighter static bound (set per scene
    by the trainer's probes / transmittance retune). With a warm
    occupancy field the median ray crosses a small fraction of the
    batch-max bound — quantile bucketing is what converts that into
    wall-clock on the T-proportional shading stages."""
    bucket_short_steps: Optional[int] = None
    """Interval bound for the shallowest bucket (None = tuned by the
    trainer, falling back to a linear split of max_steps); for
    ray_buckets > 2 the inner bounds interpolate linearly from it."""
    bucket_bound_margin: float = 1.15
    """Safety margin the warm retune applies when sizing each quantile
    bucket's interval bound from its chunk of the probe distribution
    (``utils.shapes.inner_bound``). Bucketing sorts every batch by the
    same crossing-count key the bounds were sized from, so the margin
    only absorbs batch-to-batch quantile jitter — far smaller than the
    main bound's 1.5x distribution-shift margin. Truncation grows the
    bound back at the next retune and is surfaced via ``overflow_rays``
    meanwhile.

    Exposure window: with ``ray_buckets >= 2`` the MAIN bound is also
    sized from the top quantile chunk with this margin, and the main
    bound caps the geometry march itself — so between retunes a
    crossing-distribution shift deeper than the margin truncates the
    deepest rays' FAR geometry (not just shading). The window is one
    retune interval (``occupancy_retune_every`` steps) and is bounded by
    three mitigations: the default p100 retune percentile sizes from the
    batch max, the retune takes the elementwise MAX over the last 3
    probes (a shrink needs 3 agreeing probes), and growth is accepted
    immediately. Raise this margin (e.g. 1.5) if a scene's crossing
    distribution genuinely drifts between retunes."""
    bucket_merge_mlps: bool = False
    """Run the MLP rounds ONCE over all buckets' flattened samples
    instead of per bucket (``TetraNerf._shade_buckets_merged``): 2 MLP
    chains per step instead of 2 x ray_buckets, and one set of
    weight-gradient reductions in the backward. Interp / PDF / render
    stay per-bucket. Identical math per sample; ignored when the
    gradient-budget, bf16-stream, or fused-MLP paths are active."""
    bucket_adaptive_samples: bool = True
    """Scale each bucket's sample budget with its depth bound
    (``utils.shapes.scaled_budget``): per-crossing sample density never
    drops below the full budget's, so shallow buckets stop paying
    full-depth [R, S, ·] MLP + interpolation rounds. The same policy as
    the depth-sorted viewer refine (``Trainer.adaptive_budget``)."""
    traversal_hops: int = 1
    """Cells advanced per sequential gather in the marcher (1 or 2; 2
    needs ``build_mesh(two_hop_table=True)``, 2x march-table memory).
    The march is row-COUNT-bound and 128-float rows gather at the same
    row rate as 64-float rows (r5 width sweep), so two-hop halves the
    march's gather-chain rows; outputs are bit-identical (the full
    flagship semantics — occupancy, stream dedup, compaction — run
    per hop)."""
    march_compaction: int = 4
    """Per-ray compaction stages in the march: each time at most
    ``march_compact_ratio`` of the rays are still marching, actives are
    packed into a dense prefix and the march continues at the narrower
    width. Bit-identical
    output; converts per-ray early termination (occupancy, short chords,
    missed rays) into wall-clock. 0 disables."""
    march_compact_ratio: float = 0.7
    """Width ratio between consecutive compaction stages (rounded to
    multiples of 128). Finer ratios (0.7, the measured r5 default with
    4 stages: 70.5 -> 69.7 ms/step warm) compact earlier and more
    often — the march pays ``width`` rows per step while only
    ``active`` rays live, so a finer staircase hugs the alive curve at
    the cost of one more while_loop per stage in the executable (raise
    ``march_compaction`` accordingly: stages to reach a floor w_min
    ~= log(w_min/num_rays)/log(ratio))."""
    grad_stream_budget_per_ray: Optional[int] = None
    """Compact the backward field scatter to each ray's VALID stream
    prefix, with a flat row budget of ``budget_per_ray * num_rays``
    (None = dense). The dense transpose of the endpoint-feature gather
    scatters R*(T+4) rows — mostly zero-valued padding, yet XLA pays
    per row; it is the largest single op of the backward (~29 ms at
    [8K, 260] into [100K, 64]). Valid rows per ray are ``num_valid+4``
    (mean ~55 on the warm bench scene), so a budget of ~2x the mean
    makes overflow statistically negligible (the batch SUM concentrates
    at sigma/mean ~ 1/sqrt(R)); rays past the budget lose their field
    gradient for that step and are counted in the
    ``grad_stream_dropped_rays`` metric."""
    field_stream_dtype: str = "float32"
    """Dtype the endpoint-feature stream moves at (``"float32"`` |
    ``"bfloat16"``). ``bfloat16`` halves the bytes of the two random-row
    stream walls — the forward [R, T+4, F] vertex gather and the
    backward's gradient-row scatter reads — while the [V, F] field
    gradient still ACCUMULATES in f32 (``ops.fused.gather_rows_lowp``).
    Field values round once to bf16 before the blend (which already
    computes in bf16); per-row gradients round once before the f32
    scatter-add. Pays only if those walls are row-BYTE-bound on the
    target chip (``benchmarks/microbench_rowwidth.py`` is the decider);
    ignored when ``grad_stream_budget_per_ray`` compaction is active."""
    far_plane: float = 1e3
    """Depth reported for rays that hit nothing (reference uses the
    collider's far plane, ``model.py:645-650``)."""
    depth_method: Literal["median", "expected"] = "median"

    def __post_init__(self):
        if self.tetrahedra_path is not None and self.num_tetrahedra_vertices is None:
            from ..geometry.io import load_tetrahedra

            path = Path(self.tetrahedra_path)
            if not path.exists():
                raise RuntimeError(f"Tetrahedra path {path} does not exist")
            data = load_tetrahedra(path)
            self.num_tetrahedra_vertices = len(data["vertices"])
            self.num_tetrahedra_cells = len(data["cells"])
