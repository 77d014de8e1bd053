"""Training loop: optimizer, jitted train step, checkpointing.

Replaces the nerfstudio ``Trainer`` + ``VanillaPipeline`` layers the
reference delegates to (SURVEY L0; ``registration.py:20-46``):
RAdam with exponential lr decay 1e-3 → 1e-4 over 300k steps, MSE loss,
periodic checkpoints. The whole step — traversal, sampling, MLPs,
rendering, backward, optimizer — compiles into one XLA program with no
host synchronization (the reference syncs the device on every tracer
call, ``src/tetrahedra_tracer.cpp:173-174``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.tetra_nerf import RayBundle, TetraNerf
from ..parallel.sharding import (
    batch_sharding,
    make_mesh,
    put_replicated,
    replicate,
    state_shardings,
)
from .presets import TrainConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # i32 scalar

    def replace(self, **kwargs):
        return dataclasses.replace(self, **kwargs)


# Shape policy (shared with the model's bucketed shading and the render
# benchmarks — see utils/shapes.py for why values land on one coarse
# grid: every distinct bound is a distinct static shape, i.e. a full
# XLA recompile). The private aliases remain for existing callers.
from ..utils.shapes import (  # noqa: E402
    BOUND_GRID as _BOUND_GRID,
    grid_ceil as _grid_ceil,
    inner_bound as _inner_bound,
    rounded_bound as _rounded_bound,
    scaled_budget as _scaled_budget,
)


def _quantile_bucket_stats(
    nv: np.ndarray, k_buckets: int, percentile: float
) -> tuple:
    """Raw per-chunk statistics for quantile-bucketed shading: rays
    sort by crossing count and split into K equal buckets; chunk k's
    statistic is its retune-percentile crossing count (floats, no
    margin/grid — margins apply after cross-retune smoothing)."""
    snv = np.sort(nv)
    return tuple(
        float(np.percentile(
            snv[snv.size * k // k_buckets : snv.size * (k + 1) // k_buckets],
            percentile,
        ))
        for k in range(k_buckets)
    )


def _ranked_chunk_stats(
    key: np.ndarray, value: np.ndarray, k_buckets: int, percentile: float
) -> tuple:
    """Per-chunk statistics of ``value`` with rays RANKED BY ``key``.

    The bucketed shading sorts rays by the march's EMITTED crossing
    count (``key``), so chunk membership must follow that ranking —
    but each chunk's bound is sized from its members' TRUE-need
    crossing counts (``value``, the transmittance probe's nv_eff).
    ``value <= key`` for every ray the termination cap protects, so
    this is as tight as pure need-based sizing while staying
    consistent with the sort: sizing chunks from need ALONE while
    ranking by emitted counts truncated VISIBLE content (high-
    estimator-bias rays emit few crossings, rank shallow, and were
    cut below their own need — the 20k image-path decay)."""
    order = np.argsort(key, kind="stable")
    n = order.size
    return tuple(
        float(np.percentile(
            value[order[n * k // k_buckets : n * (k + 1) // k_buckets]],
            percentile,
        ))
        for k in range(k_buckets)
    )


def _bounds_from_stats(stats, full: int, margin: float = 1.15) -> tuple:
    """Inner bounds (len ``K - 1``) from the first K-1 chunk statistics:
    small margin on a fine (multiple-of-8) grid — see
    ``utils.shapes.inner_bound`` for why the main bound's
    1.5x/coarse-grid policy is wrong here — clamped to the full bound
    and forced nondecreasing."""
    inner, cur = [], 16
    for s in stats[:-1]:
        b = _inner_bound(s, margin)
        cur = min(max(b, cur), full)
        inner.append(cur)
    return tuple(inner)


def _quantile_bucket_bounds(
    nv: np.ndarray, k_buckets: int, full: int, percentile: float,
    margin: float = 1.15,
) -> tuple:
    """Single-probe convenience: ``_bounds_from_stats`` of
    ``_quantile_bucket_stats`` (the retune smooths stats across probes
    instead of calling this directly)."""
    return _bounds_from_stats(
        _quantile_bucket_stats(nv, k_buckets, percentile), full, margin
    )


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """RAdam + exponential decay (``registration.py:37-45``)."""
    schedule = optax.exponential_decay(
        init_value=config.learning_rate,
        transition_steps=config.lr_max_steps,
        decay_rate=config.learning_rate_final / config.learning_rate,
    )
    return optax.radam(learning_rate=schedule)


def make_train_step(
    model: TetraNerf,
    optimizer: optax.GradientTransformation,
    max_steps: Optional[int] = None,
    bucket_steps=None,
) -> Callable:
    """Build the (un-jitted) functional train step.

    ``max_steps``/``bucket_steps`` override the model config's traversal
    bounds (tuned per scene by ``Trainer.tune_traversal_steps``; the
    config itself is never mutated). The returned metrics include
    ``overflow_rays`` — how many rays' traversal was truncated by the
    bound this step; a persistently nonzero value means far geometry is
    being dropped and the bound is too tight.
    """

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng, mesh, occ_cap
    ):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            rays = RayBundle(
                origins=batch["origins"],
                directions=batch["directions"],
                camera_indices=batch.get("camera_indices"),
            )
            outputs = model.get_outputs(
                params, rays, rng=rng, train=True, mesh=mesh,
                max_steps=max_steps, bucket_steps=bucket_steps,
                occ_depth_cap=occ_cap,
            )
            loss = jnp.mean(jnp.square(outputs["rgb"] - batch["rgb"]))
            return loss, outputs

        (loss, outputs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {
            "loss": loss,
            "psnr": -10.0 * jnp.log10(loss + 1e-12),
            "overflow_rays": jnp.sum(
                outputs["traversal_overflow"].astype(jnp.int32)
            ),
        }
        if "grad_stream_dropped" in outputs:
            metrics["grad_stream_dropped_rays"] = jnp.sum(
                outputs["grad_stream_dropped"].astype(jnp.int32)
            )
        return new_state, metrics

    return train_step


def make_eval_step(
    model: TetraNerf,
    max_steps: Optional[int] = None,
    bucket_steps=None,
) -> Callable:
    def eval_step(params, batch, mesh, occ_cap):
        rays = RayBundle(
            origins=batch["origins"],
            directions=batch["directions"],
            camera_indices=batch.get("camera_indices"),
        )
        return model.get_outputs(
            params, rays, rng=None, train=False, mesh=mesh,
            max_steps=max_steps, bucket_steps=bucket_steps,
            occ_depth_cap=occ_cap,
        )

    return eval_step


class Trainer:
    """Single- or multi-chip trainer.

    Rays are sharded over the device mesh's ``data`` axis; parameters are
    replicated; GSPMD inserts the gradient all-reduce (see
    ``tetranerf_tpu.parallel``).
    """

    def __init__(
        self,
        config: TrainConfig,
        model: TetraNerf,
        *,
        point_colors: Optional[np.ndarray] = None,
        mesh_devices: Optional[int] = None,
        devices=None,
        auto_tune_steps: bool = True,
    ):
        self.config = config
        self.model = model
        self._auto_tune_steps = auto_tune_steps
        self._tuned = False
        # mesh_devices / num_data_shards count DATA shards; with
        # num_model_shards > 1 the mesh is (data x model), so the total
        # device count is their product.
        model_shards = getattr(config, "num_model_shards", 1) or 1
        num_devices = mesh_devices or config.num_data_shards
        if num_devices is not None and model_shards > 1:
            num_devices = num_devices * model_shards
        self.device_mesh = make_mesh(
            num_devices=num_devices,
            devices=devices,
            model_shards=model_shards,
        )
        self.optimizer = make_optimizer(config)
        key = jax.random.PRNGKey(config.seed)
        self.init_key, self.train_key = jax.random.split(key)
        params = model.init_params(self.init_key, point_colors=point_colors)
        opt_state = self.optimizer.init(params)
        rep = replicate(self.device_mesh)
        state = TrainState(
            params=params, opt_state=opt_state, step=jnp.int32(0)
        )
        # On a ``data x model`` mesh the feature field (+ its optimizer
        # moments) is sharded over its feature axis; everything else is
        # replicated (see ``parallel.state_shardings``).
        self._state_sharding = state_shardings(self.device_mesh, state)
        self._params_sharding = self._state_sharding.params
        self.state = jax.device_put(state, self._state_sharding)
        # The tetrahedra mesh tables are jit *arguments* (replicated), not
        # closed-over constants — constants would be embedded per
        # executable (hundreds of MB of HLO). The fused hops=1 path reads
        # only the packed march table + hull arrays, so the device copy
        # is slimmed (~40% fewer mesh bytes per device).
        device_mesh_tables = model.mesh.slim(
            keep_two_hop=model.config.traversal_hops == 2
        )
        self.mesh_tables = put_replicated(
            device_mesh_tables, self.device_mesh
        )
        self._rep = rep
        self._batch_sharding = batch_sharding(self.device_mesh)
        # Scene-tuned traversal bounds (None = the config's). Set by
        # tune_traversal_steps; the user's config is NEVER mutated.
        # ``tuned_bucket_steps`` holds the ``ray_buckets - 1`` inner
        # quantile-bucket bounds (ascending; the deepest bucket always
        # shades at the main bound).
        self.tuned_max_steps: Optional[int] = None
        self.tuned_bucket_steps: Optional[tuple] = None
        self._build_steps()
        # Bound the async dispatch queue: with no host sync at all, XLA's
        # multi-device CPU client aborts once too many collective-bearing
        # steps are in flight. A depth of 4 keeps full pipelining.
        self._pending = []
        self._max_in_flight = 4
        # Jitted eval variants keyed by sample-budget override.
        self._fast_eval_fns: Dict[Any, Callable] = {}
        # Occupancy early-termination state (use_occupancy_field).
        self._occ = None
        self._occ_update = None
        self._step_count = 0
        # Termination depth cap, CALIBRATED against the model's true
        # optical depth at every transmittance retune (the EMA's
        # overestimation grows as the surface sharpens — a fixed
        # -log(threshold) cap eventually terminates rays while real
        # light remains; measured eval PSNR 30.9 -> 7.9 by 10k steps).
        # Passed to the jitted steps as a TRACED scalar: recalibration
        # never recompiles.
        self._occ_cap = float(
            -np.log(self.model.config.occupancy_threshold)
        )
        self._occ_cap_dev = jax.device_put(
            jnp.float32(self._occ_cap), rep
        )
        # Monotone counter bumped whenever anything a cached march
        # depends on changes (occupancy column, skip grid, termination
        # cap, tuned bounds). Cache holders (the viewer) key on it so a
        # march cached before the density field moved is never re-shaded
        # as if it were current — occupancy termination bakes the
        # density into the cached geometry.
        self._march_version = 0

    @property
    def march_version(self) -> int:
        return self._march_version

    @property
    def tuned_short_steps(self) -> Optional[int]:
        """Shallowest tuned bucket bound (legacy K=2 name)."""
        return (
            self.tuned_bucket_steps[0] if self.tuned_bucket_steps else None
        )

    def _build_steps(self):
        """(Re)build the jitted train/eval steps with the current tuned
        traversal bounds. Cheap until first call — jit compiles lazily."""
        rep, bsh = self._rep, self._batch_sharding
        if hasattr(self, "_fast_eval_fns"):
            self._fast_eval_fns.clear()  # bounds baked at trace time
            self._occ_update = None
        # Tuned-bound changes alter the default marcher bound — caches
        # of earlier marches must not be re-shaded as current.
        self._march_version = getattr(self, "_march_version", -1) + 1
        self._train_step = jax.jit(
            make_train_step(
                self.model,
                self.optimizer,
                self.tuned_max_steps,
                self.tuned_bucket_steps,
            ),
            in_shardings=(self._state_sharding, bsh, rep, rep, rep),
            out_shardings=(self._state_sharding, rep),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(
                self.model, self.tuned_max_steps, self.tuned_bucket_steps
            ),
            in_shardings=(self._params_sharding, bsh, rep, rep),
            out_shardings=bsh,
        )

    def _probe_arrays(self, batch: Dict[str, np.ndarray], limit: int = 8192):
        """Global ``(origins, directions)`` arrays for bound/occupancy
        probes — multi-host safe. Each process passes only its OWN rows
        (its ``host_batch_slice`` of the global batch, same contract as
        :meth:`train_step`); the assembled global arrays are identical on
        every process, so probe statistics (and the bounds derived from
        them) agree across the pod without extra synchronization. The
        probes' jits emit replicated outputs for the same reason:
        ``np.asarray`` of a non-fully-addressable array raises."""
        from ..parallel.sharding import make_global_batch

        sub = {
            "origins": np.asarray(batch["origins"][:limit], np.float32),
            "directions": np.asarray(
                batch["directions"][:limit], np.float32
            ),
        }
        g = make_global_batch(sub, self.device_mesh)
        return g["origins"], g["directions"]

    def tune_traversal_steps(self, batch: Dict[str, np.ndarray]) -> int:
        """Shrink the traversal step bound to the scene's actual needs.

        The configured ``max_intersected_triangles`` (default 512,
        reference ``model.py:77``) is a worst-case cap; most scenes cross
        far fewer cells. A one-off geometry-only probe marches up to 8192
        rays and tightens the bound to 1.5x the observed maximum crossing
        count (rounded up to a multiple of 16), shortening the sequential
        gather chain that dominates the step time.

        The tuned bound lives on the trainer (``tuned_max_steps``) — the
        user's config is never mutated — and truncation on later, deeper
        batches is surfaced as the ``overflow_rays`` train metric rather
        than silently dropping far geometry (the reference's hard cap
        does drop it, ``optix_trace_rays.cu:312-315``).
        """
        import jax.numpy as jnp

        from ..ops.fused import march_features

        from ..ops.traversal import hull_intersect

        cfg = self.model.config
        o, d = self._probe_arrays(batch)

        def probe(m, o, d):
            res = march_features(
                m, None, o, d, cfg.max_intersected_triangles,
                hops=cfg.traversal_hops,
            )
            t_in, t_out, _, hit = hull_intersect(m, o, d)
            chord = jnp.where(hit, t_out - jnp.maximum(t_in, 0.0), 0.0)
            return res.num_valid, chord

        num_valid, chord = jax.jit(probe, out_shardings=self._rep)(
            self.mesh_tables, o, d
        )
        num_valid = np.asarray(num_valid)
        rounded_bound = _rounded_bound

        tuned = min(
            cfg.max_intersected_triangles, rounded_bound(num_valid.max())
        )
        if tuned < cfg.max_intersected_triangles:
            self.tuned_max_steps = tuned
        if cfg.ray_buckets >= 2 and cfg.bucket_short_steps is None:
            # Cold probe: size inner bucket bounds from the crossing
            # distribution's own quantile chunks at p100 with the WIDE
            # 1.5x margin (no truncation before the model has trained
            # anything; warm retunes tighten to the config margin).
            self.tuned_bucket_steps = _quantile_bucket_bounds(
                num_valid, cfg.ray_buckets, tuned, 100.0, margin=1.5
            )
        self._build_steps()
        return self.tuned_max_steps or cfg.max_intersected_triangles

    # ------------------------------------------------------------ occupancy
    def _occupancy_update_fn(self):
        """Jitted EMA update of the per-cell DENSITY estimate from the
        current field: a coarse inference pass evaluates per-sample
        density, the per-interval MEAN density is reduced gather-free,
        and cells take ``max(decay * occ, sigma)`` — the role the
        reference built ``scatter_ema_uint32`` for
        (``src/tetrahedra_tracer.cu:55-113``) but never wired in.

        The EMA MUST store per-cell *density*, not blend weight: blend
        weights ``w = alpha * T`` along a ray sum to at most 1, so a
        weight-based transmittance proxy ``prod(1 - w_i)`` is bounded
        below by ~``exp(-sum w) >= e^-1`` and can never cross a 1e-3
        termination threshold. Density has no such bound — the march
        accumulates ``sigma * dt`` (exact per-ray chords) into an
        optical depth that diverges at an opaque surface, so rays
        genuinely terminate there while grazing rays (tiny chords)
        correctly keep marching (measured on the bench scene: mean
        crossings 173.6 -> ~entry-shell depth).

        The per-interval reduction is the MEAN sample density, not the
        max: the march consumes the estimate as ``sigma * chord``, i.e.
        as the chord-average density, and a max-of-samples estimate
        overstates the true optical depth at a sharp surface (density
        ramps from ~0 to huge across the crossing; its peak is ~2-5x
        its chord mean). Measured on the bench scene, the max estimator
        terminated rays while their TRUE transmittance was still
        5-10%, visibly corrupting supervision: train loss rose from
        0.0003 (termination off) to 0.018-0.020 as the surface
        sharpened. A mean estimate keeps estimated depth ~= true depth,
        so crossing the threshold means the light really is gone."""
        if self._occ_update is not None:
            return self._occ_update
        from ..ops.fused import (
            biased_warp_range,
            march_features,
            ray_bounds,
            sample_features,
        )
        from ..ops.sampling import stratified_bins

        model = self.model
        cfg = model.config
        max_steps = self.tuned_max_steps or cfg.max_intersected_triangles
        nsamp = cfg.num_samples

        def update(params, occ, origins, directions, mesh, occ_cap):
            res = march_features(
                mesh,
                params["tetrahedra_field"],
                origins,
                directions,
                max_steps,
                use_occupancy=True,
                occ_depth_cap=occ_cap,
            )
            nears, fars, first, nk, mask = ray_bounds(res)
            bins01 = stratified_bins(None, origins.shape[0], nsamp)
            euclid = nears[:, None] + bins01 * (fars - nears)[:, None]
            if cfg.use_biased_sampler:
                euclid = biased_warp_range(
                    res, first, nk, nears, fars, euclid
                )
            distances = (euclid[:, 1:] + euclid[:, :-1]) / 2.0
            feats, smask = sample_features(res, distances, mask)
            _, dens = model._field_mlps(
                params, feats, directions, None, False
            )
            dens = jnp.where(smask, dens, 0.0)
            # Per-interval max sample density, gather-free.
            t1 = res.t1
            max_t = t1.shape[1]
            gt = t1[:, None, :] > distances[:, :, None]  # [R, S, T]
            k = max_t - jnp.sum(gt.astype(jnp.int32), axis=-1)
            slots = jnp.arange(max_t, dtype=jnp.int32)[None, None, :]
            onehot = slots == jnp.minimum(k, max_t - 1)[:, :, None]
            in_int = onehot & smask[:, :, None]
            sig_sum = jnp.sum(
                jnp.where(in_int, dens[:, :, None], 0.0), axis=1
            )
            sig_cnt = jnp.sum(in_int, axis=1)
            # [R, T] per-interval MEAN density (neither the blend weight
            # nor the max — see the docstring above). Intervals with no
            # samples stay 0: scatter-max of 0 is a no-op, so they
            # simply contribute no observation.
            sig_int = sig_sum / jnp.maximum(sig_cnt, 1)
            cells_flat = jnp.where(res.valid, res.cells, -1).reshape(-1)
            vals = jnp.where(cells_flat >= 0, sig_int.reshape(-1), 0.0)
            occ = occ * cfg.occupancy_decay
            # Invalid slots write max(occ[0], 0) == occ[0]: a no-op.
            occ = occ.at[jnp.maximum(cells_flat, 0)].max(vals)
            return occ

        self._occ_update = jax.jit(
            update, donate_argnums=(1,), out_shardings=self._rep
        )
        return self._occ_update

    def _write_occ_column(self):
        """Write the occupancy EMA into the packed march-table column.

        The result is pinned to ROW-major layout: XLA lays the output
        of the column write out column-major, and a column-major march
        table makes every subsequent train step re-copy the 165 MB
        table to row-major TWICE (measured 1.5 ms/step in the device
        trace) — pay one layout copy here (every
        ``occupancy_update_every`` steps) instead."""
        updated = self.mesh_tables.with_occupancy(self._occ)
        try:
            from jax.experimental.layout import Format, Layout

            dst = Format(Layout((0, 1)), self._rep)
        except ImportError:  # older jax: accept the per-step copies
            dst = self._rep
        repl = {"march_table": jax.device_put(updated.march_table, dst)}
        if updated.march_table2.shape[0]:
            # Two-hop rows carry every block's occupancy column (the
            # block layout lives in ONE place: mesh._two_hop_occ_update,
            # shared with with_occupancy).
            repl["march_table2"] = jax.device_put(
                updated.march_table2, dst
            )
        self.mesh_tables = dataclasses.replace(self.mesh_tables, **repl)
        self._march_version += 1

    def _ensure_occ(self):
        if self._occ is None:
            self._occ = jax.device_put(
                jnp.zeros(self.model.mesh.num_cells, jnp.float32), self._rep
            )

    def update_occupancy(self, batch: Dict[str, np.ndarray]):
        """Ray-based occupancy EMA update + the packed column write.

        Multi-host: like :meth:`train_step`, each process passes its own
        local rows; the global batch-sharded arrays are assembled here
        (the EMA itself is replicated, so the update is identical on
        every process)."""
        self._ensure_occ()
        from ..parallel.sharding import make_global_batch

        g = make_global_batch(
            {
                "origins": np.asarray(batch["origins"], np.float32),
                "directions": np.asarray(batch["directions"], np.float32),
            },
            self.device_mesh,
        )
        o, d = g["origins"], g["directions"]
        self._occ = self._occupancy_update_fn()(
            self.state.params, self._occ, o, d, self.mesh_tables,
            self._occ_cap_dev,
        )
        self._write_occ_column()

    def _occupancy_refresh_setup(self):
        """Per-cell centroid-eval table for the full-coverage refresh:
        the cell->vertex index list, chunk-reshaped for ``lax.map``."""
        if getattr(self, "_occ_cells", None) is not None:
            return
        cells = np.asarray(self.model.mesh.cells)
        num_cells = len(cells)
        k = min(65536, -(-num_cells // 256) * 256)  # chunk rows
        padded = -(-num_cells // k) * k
        cells_pad = np.zeros((padded, 4), np.int32)
        cells_pad[:num_cells] = cells
        self._occ_cells = jax.device_put(
            jnp.asarray(cells_pad.reshape(padded // k, k, 4)), self._rep
        )

    def _occupancy_refresh_fn(self):
        if getattr(self, "_occ_refresh", None) is not None:
            return self._occ_refresh
        model = self.model
        cfg = model.config
        num_cells = model.mesh.num_cells

        def refresh(params, occ, cells_ch):
            field = params["tetrahedra_field"]

            def chunk(cc):
                feats = jnp.mean(field[cc], axis=1)  # centroid features
                return model.density_at(params, feats)

            dens = jax.lax.map(chunk, cells_ch).reshape(-1)
            return jnp.maximum(
                occ * cfg.occupancy_decay, dens[:num_cells]
            )

        self._occ_refresh = jax.jit(refresh, donate_argnums=(1,))
        return self._occ_refresh

    def refresh_occupancy(self):
        """Full-coverage occupancy refresh: per-cell density from the
        MLP at every cell centroid (no rays — no sampling holes; the
        centroid's interpolated feature is the exact barycentric mean
        of its 4 vertex features), maxed into the decayed EMA, then
        written to the packed march-table column. One refresh warms the
        ENTIRE field once the surface has formed (vs. hundreds of steps
        of stochastic ray coverage), so the occupancy-aware bound
        retune can bite early. Centroid sampling UNDERestimates
        off-center density peaks — which only delays termination
        (safe), never truncates real contribution."""
        self._ensure_occ()
        self._occupancy_refresh_setup()
        self._occ = self._occupancy_refresh_fn()(
            self.state.params, self._occ, self._occ_cells
        )
        self._write_occ_column()
        self._rebuild_skip_grid()

    def _rebuild_skip_grid(self):
        """(Re)build the empty-space skip grid from the occupancy EMA
        and attach it to the device mesh tables (``ops/skip_grid.py``).
        The one-time anchor/voxel setup is cached; the per-refresh
        rebuild is a jitted dense-grid pass. The first attach changes
        the skip table's static shape, so the train step retraces once
        (persistent-cached thereafter)."""
        cfg = self.model.config
        res = getattr(cfg, "skip_grid_resolution", 0)
        if not res or self._occ is None:
            return
        # Collapse guard: an (effectively) all-empty EMA would mark the
        # whole grid free and skip EVERY ray's full chord — no samples,
        # no gradient, training dead. Only attach a grid once the field
        # has formed estimated density somewhere.
        if float(jnp.max(self._occ)) <= cfg.skip_grid_eps:
            return
        from ..ops.skip_grid import build_skip_table, make_skip_setup

        if getattr(self, "_skip_setup", None) is None:
            self._skip_setup = make_skip_setup(
                self.model.mesh, res,
                march_table=self.mesh_tables.march_table,
            )
            import functools

            self._skip_build = jax.jit(
                functools.partial(
                    build_skip_table, skip_eps=cfg.skip_grid_eps
                )
            )
        table = self._skip_build(self._occ, self._skip_setup)
        self.mesh_tables = dataclasses.replace(
            self.mesh_tables,
            skip_table=jax.device_put(table, self._rep),
            skip_meta=jax.device_put(self._skip_setup.meta, self._rep),
        )
        self._march_version += 1

    def _nv_eff_fn(self):
        """Jitted probe: per-ray crossing count at which the CURRENT
        model's own optical depth exhausts the light. Marches the FULL
        config cap with no termination (one static shape — compiled
        once, ever), samples exactly like the coarse pass, accumulates
        ``sigma * delta`` from the real MLP densities, and counts the
        crossings whose entry precedes the first sample where the
        accumulated depth passes ``-log(occupancy_threshold)``."""
        if getattr(self, "_nv_eff", None) is not None:
            return self._nv_eff
        from ..models.tetra_nerf import _interp_backend
        from ..ops.fused import (
            biased_warp_range,
            march_features,
            ray_bounds,
            sample_features,
        )
        from ..ops.sampling import stratified_bins

        model = self.model
        cfg = model.config
        cap = cfg.max_intersected_triangles
        nsamp = cfg.num_samples
        depth_cap = -float(np.log(cfg.occupancy_threshold))

        def probe(params, origins, directions, mesh):
            res = march_features(
                mesh,
                params["tetrahedra_field"],
                origins,
                directions,
                cap,
                hops=cfg.traversal_hops,
            )
            nears, fars, first, nk, mask = ray_bounds(res)
            bins01 = stratified_bins(None, origins.shape[0], nsamp)
            euclid = nears[:, None] + bins01 * (fars - nears)[:, None]
            if cfg.use_biased_sampler:
                euclid = biased_warp_range(
                    res, first, nk, nears, fars, euclid
                )
            distances = (euclid[:, 1:] + euclid[:, :-1]) / 2.0
            deltas = euclid[:, 1:] - euclid[:, :-1]
            feats, smask = sample_features(
                res,
                distances,
                mask,
                use_matmul=_interp_backend(cfg.interp_mode),
                compute_dtype=jnp.dtype(cfg.compute_dtype),
            )
            _, dens = model._field_mlps(
                params, feats, directions, None, False
            )
            dens = jnp.where(smask, dens, 0.0)
            od = jnp.cumsum(dens * deltas, axis=1)
            exhausted = od > depth_cap
            d_star = jnp.min(
                jnp.where(exhausted, distances, jnp.inf), axis=1
            )
            nv_eff = jnp.sum(
                res.valid & (res.t0 <= d_star[:, None]), axis=1
            )
            # ESTIMATED (EMA) optical depth accumulated up to the true
            # exhaustion point — what the march's early-exit would have
            # seen there. Rays that never exhaust keep their full-chord
            # estimated depth: the cap must exceed it or they would be
            # cut while light remains.
            sig_est = mesh.march_table[:, 24][
                jnp.maximum(res.cells, 0)
            ]  # [R, T]
            dt = jnp.where(res.valid, res.t1 - res.t0, 0.0)
            est_cum = jnp.cumsum(sig_est * dt, axis=1)
            within = res.valid & (res.t1 <= d_star[:, None])
            est_at = jnp.max(
                jnp.where(within, est_cum, 0.0), axis=1
            )
            return nv_eff, est_at

        self._nv_eff = jax.jit(probe, out_shardings=self._rep)
        return self._nv_eff

    def _march_nv_fn(self):
        """Jitted probe of the march's EMITTED crossing counts at the
        full config bound under the current (traced) termination cap —
        the distribution the bucketed shading both sorts and bounds by."""
        if getattr(self, "_march_nv", None) is not None:
            return self._march_nv
        from ..ops.fused import march_features

        cfg = self.model.config

        def probe(m, o, d, occ_cap):
            return march_features(
                m, None, o, d, cfg.max_intersected_triangles,
                hops=cfg.traversal_hops,
                use_occupancy=cfg.use_occupancy_field,
                occ_threshold=cfg.occupancy_threshold,
                occ_depth_cap=occ_cap,
            ).num_valid

        self._march_nv = jax.jit(probe, out_shardings=self._rep)
        return self._march_nv

    def retune_with_transmittance(self, batch: Dict[str, np.ndarray]) -> int:
        """Size the static traversal bound from the model's OWN optical
        depth: per ray, count crossings up to the sample where the
        render's accumulated depth passes ``-log(occupancy_threshold)``
        — i.e. where the remaining transmittance (and with it everything
        a far-tail truncation could remove from the pixel) drops below
        the threshold. Unlike the march-estimate retune
        (:meth:`retune_with_occupancy`) this does not depend on the
        EMA's calibration: the probe IS the renderer's density at full
        sample resolution, so a p-percentile bound truncates only
        content the render provably cannot see. The march's EMA
        termination stays as a per-ray early-exit for compaction; rays
        it leaves deep are cut by this bound and counted in
        ``overflow_rays``."""
        cfg = self.model.config
        fn = self._nv_eff_fn()
        o, d = self._probe_arrays(batch)
        nv, est_at = fn(self.state.params, o, d, self.mesh_tables)
        nv = np.asarray(nv)
        # Calibrate the march-termination depth cap so the estimated
        # depth crosses it only BEHIND the true exhaustion point for
        # (at least) 99.9% of rays. The EMA's overestimation factor
        # grows as the surface sharpens; a fixed -log(threshold) cap
        # eventually terminates rays with real light remaining
        # (measured: eval PSNR 30.9 -> 7.9 by 10k steps on the
        # multi-view run). The cap is a traced scalar — updating it
        # never recompiles.
        est_at = np.asarray(est_at)
        floor = float(-np.log(cfg.occupancy_threshold))
        cap_now = max(
            floor,
            cfg.occ_cap_margin
            * float(np.percentile(est_at, cfg.occ_cap_percentile)),
        )
        # Drift guard: the estimator's bias GROWS as the surface
        # sharpens, so a cap sized from this probe alone can be
        # overtaken mid-interval (measured on the 20k image-path run:
        # the calibrated cap rose ~15% per 128-step interval while eval
        # PSNR decayed). Take the max over the last 3 probes — the cap
        # only ratchets down once three consecutive probes agree the
        # bias has genuinely receded.
        hist = (getattr(self, "_cap_history", []) + [cap_now])[-3:]
        self._cap_history = hist
        self._occ_cap = max(hist)
        self._occ_cap_dev = jax.device_put(
            jnp.float32(self._occ_cap), self._rep
        )
        self._march_version += 1  # cap change alters march termination
        # Bucket-bound statistics: rays RANKED by the march's EMITTED
        # crossing count under the just-recalibrated cap (the key the
        # bucketed shading sorts by), each chunk SIZED by its members'
        # TRUE-need counts (nv_eff). Ranking chunks by nv_eff alone
        # while the shading sorts by emitted counts truncated VISIBLE
        # content — the emitted count is need + overshoot, and the
        # overshoot SHRINKS as a ray's estimator bias grows, so
        # high-bias rays ranked shallow and were cut below their own
        # need (measured: the 20k image-path run's eval PSNR decayed
        # 29.9 -> 27.6 between 2.5k and 5k steps as the bias spread
        # widened; fixed by this pairing).
        nv_m = np.asarray(
            self._march_nv_fn()(
                self.mesh_tables, o, d, self._occ_cap_dev
            )
        )
        k_buckets = max(cfg.ray_buckets, 1)
        # Cross-retune smoothing: every statistic below is taken as the
        # elementwise MAX over the last 3 probes. A single deep probe
        # still GROWS any bound immediately (truncation must self-heal),
        # but a shrink needs 3 consecutive probes to agree — without
        # this, batch-sampling jitter of the per-chunk percentiles
        # oscillates bounds across grid values, and every flip is a
        # fresh static shape (a recompile) in a long run.
        raw = (
            float(np.percentile(nv, cfg.occupancy_retune_percentile)),
            # Tie guard: num_valid clamps at the main bound, and rays
            # tied there sort arbitrarily — the main bound must cover
            # the top chunk's emitted range so ties cannot spill into
            # shallower buckets (whose bounds would then cut below
            # need).
            float(np.percentile(nv_m, 100.0 * (k_buckets - 1) / k_buckets)),
        ) + _ranked_chunk_stats(
            nv_m, nv, k_buckets, cfg.occupancy_retune_percentile
        )
        hist = getattr(self, "_retune_stats", [])
        hist = ([h for h in hist if len(h) == len(raw)] + [raw])[-3:]
        self._retune_stats = hist
        smoothed = tuple(max(col) for col in zip(*hist))
        observed = int(smoothed[0])
        tie_b = smoothed[1]
        chunk_stats = smoothed[2:]
        cur = self.tuned_max_steps or cfg.max_intersected_triangles
        if cfg.ray_buckets >= 2 and cfg.bucket_short_steps is None:
            # With quantile bucketing the DEEPEST bucket shades at the
            # main bound, so size it like the inner bounds: from the top
            # quantile chunk's own need percentile with the small bucket
            # margin (instead of 1.5x the batch p99 on the coarse grid,
            # which left the top bucket pinned at the config cap) — but
            # never below the tie guard: ``num_valid`` clamps at the
            # main bound, rays tied there sort ARBITRARILY, and if more
            # than R/K rays tie the spill lands in shallower buckets
            # whose bounds can cut below need. The guard keeps the main
            # bound above the top chunk's emitted-range floor so at
            # most ~R/K rays can ever tie. Same exposure policy as
            # every bucket bound: rays beyond it surface in
            # ``overflow_rays`` and growth is accepted immediately.
            bound = min(cfg.max_intersected_triangles, max(
                16,
                _inner_bound(chunk_stats[-1], cfg.bucket_bound_margin),
                _inner_bound(tie_b, cfg.bucket_bound_margin),
            ))
        else:
            bound = min(
                cfg.max_intersected_triangles, _rounded_bound(observed)
            )
        changed = False
        if bound < cur - 16 or bound > cur:
            self.tuned_max_steps = bound
            changed = True
        full = self.tuned_max_steps or cfg.max_intersected_triangles
        if cfg.ray_buckets >= 2 and cfg.bucket_short_steps is None:
            # Per-bucket bounds from each quantile chunk's own
            # percentile (the post-march bucketing sorts by the same
            # key). Hysteresis per element, like the main bound: accept
            # any growth immediately (truncation must self-heal), but
            # only a meaningful shrink — percentile jitter across
            # retunes would otherwise oscillate bounds across grid
            # values, each a recompile.
            proposed = _bounds_from_stats(
                chunk_stats, full, margin=cfg.bucket_bound_margin
            )
            cur_b = self.tuned_bucket_steps or proposed
            if len(cur_b) != len(proposed):
                # Restored/stale bounds from a different ray_buckets
                # (e.g. a warm snapshot re-driven at a new K): the old
                # tuple cannot seed hysteresis elementwise.
                cur_b = proposed
            new_b = tuple(
                p if (p > c or p < c - 16) else c
                for p, c in zip(proposed, cur_b)
            )
            # Per-element hysteresis can break monotonicity (element k
            # shrinks past element k-1's held value); re-impose it so
            # the tuple the model clamps to is the tuple reported.
            mono, cur = [], 16
            for b in new_b:
                cur = min(max(b, cur), full)
                mono.append(cur)
            new_b = tuple(mono)
            if new_b != self.tuned_bucket_steps:
                self.tuned_bucket_steps = new_b
                changed = True
        elif self.tuned_bucket_steps is not None:
            clamped = tuple(
                min(b, full) for b in self.tuned_bucket_steps
            )
            if clamped != self.tuned_bucket_steps:
                self.tuned_bucket_steps = clamped
                changed = True
        if changed:
            self._build_steps()
        import sys

        print(
            f"# retune@{self._step_count}: bound={self.tuned_max_steps} "
            f"buckets={self.tuned_bucket_steps} "
            f"occ_cap={self._occ_cap:.1f} (floor {floor:.1f}) "
            f"nv_eff p50/p99={int(np.percentile(nv, 50))}/"
            f"{int(np.percentile(nv, 99))} "
            f"nv_march p50/p99={int(np.percentile(nv_m, 50))}/"
            f"{int(np.percentile(nv_m, 99))}",
            file=sys.stderr,
        )
        return full

    def retune_with_occupancy(self, batch: Dict[str, np.ndarray]) -> int:
        """Re-probe max crossings WITH occupancy termination and rebuild
        the step at the tighter static bound.

        A warm occupancy field stops most rays within a few dozen cells,
        but the cold-probe bound (``tune_traversal_steps``) was sized for
        full hull chords — so every [R, T]-shaped stage (march, interval
        matching, endpoint-feature buffers, the backward scatter stream)
        still pays the cold T. Shrinking the bound is the step that turns
        early termination into wall-clock across the WHOLE step.

        Safety: the probe keeps the 1.5x margin; if the observed max ever
        reaches the current bound (termination regressed / occupancy
        decayed), the margin re-opens the bound — growth, not silent
        truncation. ``overflow_rays`` still reports per-step truncation.
        """
        cfg = self.model.config
        cur = self.tuned_max_steps or cfg.max_intersected_triangles
        key = ("occ_probe", cur)
        fn = self._fast_eval_fns.get(key)
        if fn is None:
            from ..ops.fused import march_features

            def probe(m, o, d, occ_cap):
                return march_features(
                    m, None, o, d, cur,
                    use_occupancy=True,
                    occ_depth_cap=occ_cap,
                ).num_valid

            fn = jax.jit(probe, out_shardings=self._rep)
            self._fast_eval_fns[key] = fn
        o, d = self._probe_arrays(batch)
        nv = np.asarray(fn(self.mesh_tables, o, d, self._occ_cap_dev))
        # Percentile sizing: the batch max is dominated by the rare rays
        # that miss all occupied geometry and march their full hull
        # chord; sizing for (say) p99 keeps every [R, T]-shaped stage at
        # the hit-ray scale and truncates only those rays' far tails
        # (surfaced per step in ``overflow_rays``).
        observed = int(
            np.percentile(nv, cfg.occupancy_retune_percentile)
        )
        bound = min(cfg.max_intersected_triangles, _rounded_bound(observed))
        # Hysteresis: a recompile costs ~a minute on slow hosts — only
        # rebuild for a meaningful shrink, or for ANY growth (truncation).
        if bound < cur - 16 or bound > cur:
            self.tuned_max_steps = bound
            if self.tuned_bucket_steps is not None:
                self.tuned_bucket_steps = tuple(
                    min(b, bound) for b in self.tuned_bucket_steps
                )
            self._build_steps()
        return self.tuned_max_steps or cfg.max_intersected_triangles

    def train_step(self, batch: Dict[str, np.ndarray]):
        """One optimization step.

        Single-host: ``batch`` is the full global batch. Multi-host
        (``jax.process_count() > 1``): each process passes ONLY its own
        rows (its ``parallel.host_batch_slice`` of the global batch);
        the global sharded arrays are assembled here.
        """
        if self._auto_tune_steps and not self._tuned:
            self._tuned = True
            self.tune_traversal_steps(batch)
        cfg = self.model.config
        if (
            cfg.use_occupancy_field
            and cfg.occupancy_update_every
            and self._step_count % cfg.occupancy_update_every == 0
        ):
            self.update_occupancy(batch)
        if (
            cfg.use_occupancy_field
            and cfg.occupancy_refresh_every
            and self._step_count > 0
            and self._step_count % cfg.occupancy_refresh_every == 0
        ):
            self.refresh_occupancy()
        if (
            cfg.use_occupancy_field
            and cfg.occupancy_retune_every
            and self._step_count > 0
            and self._step_count % cfg.occupancy_retune_every == 0
        ):
            if cfg.occupancy_retune_mode == "transmittance":
                self.retune_with_transmittance(batch)
            else:
                self.retune_with_occupancy(batch)
        self._step_count += 1
        from ..parallel.sharding import make_global_batch

        batch = make_global_batch(batch, self.device_mesh)
        self.state, metrics = self._train_step(
            self.state, batch, self.train_key, self.mesh_tables,
            self._occ_cap_dev,
        )
        self._pending.append(metrics["loss"])
        if len(self._pending) > self._max_in_flight:
            jax.block_until_ready(self._pending.pop(0))
        return metrics

    def eval_batch(self, batch: Dict[str, np.ndarray]):
        batch = {
            k: jax.device_put(v, self._batch_sharding)
            for k, v in batch.items()
            if k in ("origins", "directions", "camera_indices")
        }
        return self._eval_step(
            self.state.params, batch, self.mesh_tables, self._occ_cap_dev
        )

    def _fast_eval_fn(self, num_samples, num_fine_samples):
        """Jitted eval step with a sample-budget override (render-speed
        knob); compiled once per distinct budget."""
        key = (num_samples, num_fine_samples)
        fn = self._fast_eval_fns.get(key)
        if fn is None:
            model = self.model

            def eval_fn(params, o, d, mesh, occ_cap):
                return model.get_outputs(
                    params,
                    RayBundle(origins=o, directions=d),
                    rng=None,
                    train=False,
                    mesh=mesh,
                    max_steps=self.tuned_max_steps,
                    bucket_steps=self.tuned_bucket_steps,
                    num_samples=num_samples,
                    num_fine_samples=num_fine_samples,
                    occ_depth_cap=occ_cap,
                )

            fn = jax.jit(eval_fn)
            self._fast_eval_fns[key] = fn
        return fn

    def _chunked(self, origins, directions, chunk, run):
        """Fixed-size chunking with tail padding; ``run(o, d, index)``
        returns a dict of per-ray arrays.

        All chunks are DISPATCHED before any result is fetched — on a
        tunneled device a synchronous per-chunk loop pays a full
        round-trip per chunk and dominates render time (measured ~4x).

        Every dispatch shards rays over the mesh's data axis, so the
        chunk is rounded up to a multiple of it — callers (nerfstudio's
        ``eval_num_rays_per_chunk``, viewer tiles) pick arbitrary
        sizes."""
        dp = int(self.device_mesh.shape.get("data", 1))
        chunk = -(-int(chunk) // dp) * dp
        num = len(origins)
        pending = []
        for ci, i in enumerate(range(0, num, chunk)):
            o = np.asarray(origins[i : i + chunk], np.float32)
            d = np.asarray(directions[i : i + chunk], np.float32)
            pad = chunk - len(o)
            if pad:
                o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
                d = np.concatenate(
                    [d, np.tile(np.float32([0, 0, 1]), (pad, 1))]
                )
            pending.append((run(o, d, ci), pad))
        outs = [
            {k: np.asarray(v)[: chunk - pad] for k, v in out.items()}
            for out, pad in pending
        ]
        return {
            k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }

    def render_rays(
        self,
        origins,
        directions,
        chunk: int = 8192,
        num_samples: Optional[int] = None,
        num_fine_samples: Optional[int] = None,
    ):
        """Render arbitrary ray sets in fixed-size chunks (eval/viewer
        path). ``num_samples``/``num_fine_samples`` trade quality for
        speed (``num_fine_samples=0`` skips the PDF round entirely)."""
        if num_samples is None and num_fine_samples is None:
            run = lambda o, d, _: self.eval_batch(
                {"origins": o, "directions": d}
            )
        else:
            fn = self._fast_eval_fn(num_samples, num_fine_samples)
            run = lambda o, d, _: fn(
                self.state.params, jnp.asarray(o), jnp.asarray(d),
                self.mesh_tables, self._occ_cap_dev,
            )
        return self._chunked(origins, directions, chunk, run)

    def _marcher_fn(self, max_steps: Optional[int] = None):
        """Jitted geometry-only marcher, compiled once per bound (jit
        caches by function identity — a fresh lambda per cache_camera
        call would re-trace for every viewer tile). Marches with the
        SAME termination config as the eval forward (occupancy +
        compaction + depth cap) so a cached march reproduces
        ``render_rays`` and inherits the warm state's short rays.

        Always ``hops=1``: re-shading a cached march needs the vertex
        STREAM, which only the one-hop path emits (``fused.py`` builds
        ``MarchStream`` on hops=1 only) — a ``traversal_hops=2`` config
        would otherwise crash in ``render_cached``."""
        cfg = self.model.config
        max_steps = (
            max_steps or self.tuned_max_steps or cfg.max_intersected_triangles
        )
        key = ("marcher", max_steps)
        fn = self._fast_eval_fns.get(key)
        if fn is None:
            from ..ops.fused import march_features

            def marcher(m, o, d, occ_cap):
                return march_features(
                    m, None, o, d, max_steps,
                    hops=1,
                    use_occupancy=cfg.use_occupancy_field,
                    occ_threshold=cfg.occupancy_threshold,
                    compact_stages=cfg.march_compaction,
                    compact_ratio=cfg.march_compact_ratio,
                    occ_depth_cap=occ_cap,
                )

            fn = jax.jit(marcher)
            self._fast_eval_fns[key] = fn
        return fn

    # ------------------------------------------------- static-camera cache
    def cache_camera(
        self,
        origins,
        directions,
        chunk: int = 8192,
        sort_by_depth: bool = False,
    ):
        """March a camera's rays ONCE and keep the per-chunk traversal
        (intervals + vertex stream) on device. Re-render the same camera
        against the training field with :meth:`render_cached` — the march
        (the dominant render cost) is skipped entirely. The viewer
        equivalent of the reference's per-frame OptiX launch.

        ``sort_by_depth`` marches twice: the first pass learns every
        ray's TRUE crossing count, then rays are re-chunked in depth
        order and each chunk re-marched at its own rounded bound. Every
        [R, T]- and [R, S, T]-shaped shading stage of the refine then
        pays the chunk's real depth instead of the camera max — with a
        warm occupancy field most chunks are an order of magnitude
        shallower than the tail chunk. Outputs are identical (the
        permutation is inverted on fetch; per-chunk bounds cover each
        chunk's observed max)."""
        origins = np.asarray(origins, np.float32)
        directions = np.asarray(directions, np.float32)
        num = len(origins)
        # Snapshot everything the march reads: with a live-training
        # viewer, a concurrent train step can advance the occupancy
        # column / termination cap between the depth-measuring pass and
        # the re-march below — pass-2 rays would then terminate later
        # than the measured num_valid and silently truncate at the
        # derived per-chunk bound.
        tables, occ_cap = self.mesh_tables, self._occ_cap_dev

        def march_chunks(o_all, d_all, bounds=None):
            chunks = []
            for ci, i in enumerate(range(0, num, chunk)):
                o = o_all[i : i + chunk]
                d = d_all[i : i + chunk]
                pad = chunk - len(o)
                if pad:
                    o = np.concatenate([o, np.zeros((pad, 3), np.float32)])
                    d = np.concatenate(
                        [d, np.tile(np.float32([0, 0, 1]), (pad, 1))]
                    )
                marcher = self._marcher_fn(bounds[ci] if bounds else None)
                chunks.append(
                    (marcher(tables, jnp.asarray(o),
                             jnp.asarray(d), occ_cap),
                     jnp.asarray(o), jnp.asarray(d))
                )
            return chunks

        chunks = march_chunks(origins, directions)
        if not sort_by_depth:
            return {"chunks": chunks, "chunk": chunk, "num_rays": num}

        nv = np.concatenate(
            [
                np.asarray(m.num_valid)[: min(chunk, num - ci * chunk)]
                for ci, (m, _, _) in enumerate(chunks)
            ]
        )
        perm = np.argsort(nv, kind="stable")
        full = self.tuned_max_steps or self.model.config.max_intersected_triangles
        bounds = [
            min(full, _grid_ceil(max(int(nv[perm[i : i + chunk]].max()), 16)))
            for i in range(0, num, chunk)
        ]
        chunks = march_chunks(origins[perm], directions[perm], bounds)
        return {
            "chunks": chunks,
            "chunk": chunk,
            "num_rays": num,
            "perm": perm,
            "bounds": bounds,
        }

    def _cached_render_fn(
        self,
        num_samples: Optional[int],
        num_fine_samples: Optional[int],
        short_steps: Optional[int] = None,
    ):
        """Jitted cached-march re-shade, compiled once per (sample
        budget, bound) combination. ``short_steps`` pins BOTH shading
        buckets to the chunk's own bound (a depth-sorted chunk is
        already depth-homogeneous; the intra-chunk short bucket would
        truncate instead of save)."""
        key = ("cached", num_samples, num_fine_samples, short_steps)
        fn = self._fast_eval_fns.get(key)
        if fn is None:
            model = self.model

            def eval_fn(params, cached, o, d, mesh):
                return model.get_outputs(
                    params,
                    RayBundle(origins=o, directions=d),
                    rng=None,
                    train=False,
                    mesh=mesh,
                    short_steps=short_steps,
                    bucket_steps=(
                        None if short_steps else self.tuned_bucket_steps
                    ),
                    num_samples=num_samples,
                    num_fine_samples=num_fine_samples,
                    cached_march=cached,
                )

            fn = jax.jit(eval_fn)
            self._fast_eval_fns[key] = fn
        return fn

    def adaptive_budget(
        self,
        bounds,
        ci: int,
        num_samples: Optional[int] = None,
        num_fine_samples: Optional[int] = None,
    ):
        """Per-chunk ``(num_samples, num_fine_samples)`` for a depth-
        sorted cache: budgets scale with the chunk's depth bound so the
        per-crossing sample density never drops below the full budget's,
        grid-rounded to bound the compile count. THE policy for both
        the viewer refine (:meth:`render_cached`) and benchmarks —
        keep them reading one implementation."""
        cfg = self.model.config
        t_c = bounds[ci]
        full = max(bounds) if bounds else 1
        base_ns = num_samples if num_samples is not None else cfg.num_samples
        base_nf = (
            num_fine_samples
            if num_fine_samples is not None
            else cfg.num_fine_samples
        )
        frac = t_c / max(full, 1)
        ns = min(base_ns, _grid_ceil(max(16, base_ns * frac)))
        nf = (
            min(base_nf, _grid_ceil(max(16, base_nf * frac)))
            if base_nf
            else base_nf
        )
        return ns, nf

    def render_cached(
        self,
        cache,
        num_samples: Optional[int] = None,
        num_fine_samples: Optional[int] = None,
        adaptive_samples: bool = False,
    ):
        """Render a camera cached by :meth:`cache_camera` with the
        CURRENT parameters (no re-march).

        ``adaptive_samples`` (depth-sorted caches only) scales each
        chunk's sample budget with its depth bound so the per-crossing
        sample density never drops below the full budget's — shallow
        chunks stop paying S=257 MLP+interp rounds for a handful of
        crossed cells. Budgets land on the same coarse grid as bounds
        to bound the compile count."""
        bounds = cache.get("bounds") if isinstance(cache, dict) else None
        pending = []
        for ci, (cached, o, d) in enumerate(cache["chunks"]):
            t_c = bounds[ci] if bounds else None
            ns, nf = num_samples, num_fine_samples
            if adaptive_samples and t_c is not None:
                ns, nf = self.adaptive_budget(bounds, ci, ns, nf)
            fn = self._cached_render_fn(ns, nf, t_c)
            pending.append(
                fn(self.state.params, cached, o, d, self.mesh_tables)
            )
        chunk = cache["chunk"]
        num = cache["num_rays"]
        outs = [
            {
                k: np.asarray(v)[: min(chunk, num - i * chunk)]
                for k, v in out.items()
            }
            for i, out in enumerate(pending)
        ]
        out = {
            k: np.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
        }
        perm = cache.get("perm") if isinstance(cache, dict) else None
        if perm is not None:
            inv = np.empty_like(perm)
            inv[perm] = np.arange(len(perm))
            out = {k: v[inv] for k, v in out.items()}
        return out

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self, path: str):
        from .checkpoints import save_checkpoint

        save_checkpoint(path, self.state, self.config)
        if self._occ is not None:
            # Persist the warm occupancy EMA: resume would otherwise
            # restart from zeros — still exact (zero occupancy never
            # terminates a ray) but cold for a few hundred steps.
            np.save(
                os.path.join(os.path.abspath(path), "occupancy.npy"),
                np.asarray(self._occ),
            )

    def restore_checkpoint(self, path: str):
        from .checkpoints import restore_checkpoint

        self.state = restore_checkpoint(path, self.state)
        occ_path = os.path.join(os.path.abspath(path), "occupancy.npy")
        if self.model.config.use_occupancy_field and os.path.exists(occ_path):
            self._occ = jax.device_put(
                jnp.asarray(np.load(occ_path)), self._rep
            )
            self._write_occ_column()
            self._rebuild_skip_grid()

    # ------------------------------------------------------------------ loop
    def fit(
        self,
        next_batch: Callable[[int], Dict[str, np.ndarray]],
        num_iterations: Optional[int] = None,
        log_every: int = 100,
        log_fn=print,
        eval_fn: Optional[Callable[[int, "Trainer"], None]] = None,
        eval_every: Optional[int] = None,
        prefetch: int = 2,
    ):
        """Training loop. ``eval_fn(step, trainer)`` runs every
        ``eval_every`` steps (defaults to the config's
        ``steps_per_eval_batch``, reference ``registration.py:34-36``).

        ``prefetch`` batches are assembled on a background thread while
        the device executes (the 20k image-path run fed at 13-18k
        rays/s HOST-bound on synchronous pixel-batch assembly, device
        mostly idle). Batch order and rng consumption are identical to
        the synchronous loop — one producer owns ``next_batch``.
        Restriction: ``next_batch`` must be a pure function of ``(i,
        its own rng)`` — it runs up to ``prefetch`` iterations AHEAD of
        the train step and concurrently with ``eval_fn``, so a
        ``next_batch`` that reads trainer state (curriculum/importance
        sampling) or shares an rng with ``eval_fn`` must pass
        ``prefetch=0`` to keep the synchronous semantics."""
        num_iterations = num_iterations or self.config.max_num_iterations
        eval_every = eval_every or self.config.steps_per_eval_batch

        if prefetch and num_iterations > 1:
            import queue as _queue
            import threading as _threading

            q: _queue.Queue = _queue.Queue(maxsize=prefetch)
            stop = _threading.Event()

            def _produce():
                try:
                    for j in range(num_iterations):
                        b = next_batch(j)  # exactly once per step
                        while not stop.is_set():
                            try:
                                q.put(b, timeout=0.5)
                                break
                            except _queue.Full:
                                continue
                        if stop.is_set():
                            return
                except BaseException as e:  # re-raised by the consumer
                    q.put(e)

            producer = _threading.Thread(target=_produce, daemon=True)
            producer.start()

            def get_batch(_):
                b = q.get()
                if isinstance(b, BaseException):
                    raise b
                return b

        else:
            stop = None
            get_batch = next_batch

        try:
            self._fit_loop(
                get_batch, num_iterations, log_every, log_fn, eval_fn,
                eval_every,
            )
        finally:
            if stop is not None:
                stop.set()
                while not q.empty():  # unblock a producer waiting on put
                    try:
                        q.get_nowait()
                    except _queue.Empty:
                        break

    def _fit_loop(
        self, next_batch, num_iterations, log_every, log_fn, eval_fn,
        eval_every,
    ):
        t0 = t_start = time.perf_counter()
        rays_per_batch = None
        steps_at_t0 = 0
        for i in range(num_iterations):
            batch = next_batch(i)
            if rays_per_batch is None:
                rays_per_batch = len(batch["origins"])
            metrics = self.train_step(batch)
            if i == 0:
                # Restart the rate clock after step 1: the first step
                # pays XLA compilation (tens of seconds), which would
                # otherwise dominate the reported rays/s for hundreds
                # of steps.
                float(metrics["loss"])
                t0 = time.perf_counter()
                steps_at_t0 = 1
            if eval_fn is not None and eval_every and (i + 1) % eval_every == 0:
                eval_fn(i + 1, self)
            if log_every and (i + 1) % log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                steps_done = i + 1 - steps_at_t0
                # log_every=1: the first log line is the compile step
                # itself — rate falls back to the cumulative window.
                if steps_done == 0:
                    steps_done, dt = 1, time.perf_counter() - t_start
                rate = steps_done * rays_per_batch / max(dt, 1e-9)
                ovf = int(metrics.get("overflow_rays", 0))
                gsd = int(metrics.get("grad_stream_dropped_rays", 0))
                log_fn(
                    f"step {i + 1}/{num_iterations} "
                    f"loss={metrics['loss']:.5f} psnr={metrics['psnr']:.2f} "
                    f"rays/s={rate:,.0f}"
                    + (f" OVERFLOW={ovf} rays truncated" if ovf else "")
                    + (
                        f" GRAD-DROPPED={gsd} rays (raise "
                        "grad_stream_budget_per_ray)"
                        if gsd
                        else ""
                    )
                )
            if (
                self.config.output_dir
                and self.config.steps_per_save
                and (i + 1) % self.config.steps_per_save == 0
            ):
                ckpt = os.path.join(
                    self.config.output_dir, f"step-{i + 1:09d}"
                )
                self.save_checkpoint(ckpt)
        return self.state
