"""The Tetra-NeRF model: traversal → sampling → field → MLPs → rendering.

Functional re-implementation of the reference ``TetrahedraNerf``
(``tetranerf/nerfstudio/model.py:209-713``) with the same computational
graph, reorganized TPU-first:

- all rays in the batch are processed with static shapes; empty rays are
  masked instead of compacted (the reference boolean-indexes the batch,
  ``model.py:539-556``);
- the per-vertex feature field is stored ``[V, F]`` (vertex-major) so
  sample gathers are contiguous; the reference stores ``[F, V]``
  (``model.py:249-255``) — checkpoints transpose at the boundary;
- MLPs run in bfloat16 on the MXU with float32 parameters/accumulation;
- the whole forward (+ backward) jits into a single XLA program — there
  are no host↔device synchronization points, unlike the reference's
  per-call ``cudaStreamSynchronize`` (``src/tetrahedra_tracer.cpp:174``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.mesh import TetrahedraMesh
from ..utils.shapes import scaled_budget
from ..ops.encoding import nerf_encoding, nerf_encoding_dim
from ..ops.fused import (
    FusedMarch,
    _slice_march,
    biased_warp_range,
    endpoint_features,
    march_features,
    ray_bounds,
    sample_features,
)
from ..ops.rendering import render_rgb_depth_acc, render_weights
from ..ops.sampling import pdf_sample, stratified_bins
from .config import TetrahedraNerfConfig
from . import nn


def _interp_backend(mode: str):
    """Map ``config.interp_mode`` to ``sample_features``' backend arg."""
    try:
        return {"matmul": True, "gather": False, "pallas": "pallas"}[mode]
    except KeyError:
        raise ValueError(
            f"unknown interp_mode {mode!r}; expected "
            "'matmul', 'pallas' or 'gather'"
        ) from None


class RayBundle(NamedTuple):
    origins: jnp.ndarray  # f32[R, 3]
    directions: jnp.ndarray  # f32[R, 3] (unit)
    camera_indices: Optional[jnp.ndarray] = None  # i32[R]


@jax.custom_vjp
def _gradient_scaler(colors, sigmas, scaling):
    return colors, sigmas


def _gradient_scaler_fwd(colors, sigmas, scaling):
    return (colors, sigmas), scaling


def _gradient_scaler_bwd(scaling, grads):
    g_colors, g_sigmas = grads
    return g_colors * scaling[..., None], g_sigmas * scaling, None


_gradient_scaler.defvjp(_gradient_scaler_fwd, _gradient_scaler_bwd)


class TetraNerf:
    """Stateless model: parameters live in a pytree, the mesh is fixed.

    Usage::

        model = TetraNerf(config, mesh)
        params = model.init_params(key, point_colors=colors)
        outputs = model.get_outputs(params, rays, rng=key2, train=True)
    """

    def __init__(
        self,
        config: TetrahedraNerfConfig,
        mesh: TetrahedraMesh,
        num_train_images: int = 0,
    ):
        self.config = config
        self.mesh = mesh
        self.num_train_images = num_train_images
        self._mlp_in_dim = nerf_encoding_dim(
            config.field_dim, config.input_fourier_frequencies
        )
        self._dir_enc_dim = nerf_encoding_dim(3, 4)
        self._head_in_dim = (
            config.hidden_size + self._dir_enc_dim + config.appearance_embed_dim
        )

    # ------------------------------------------------------------------ init
    def init_params(
        self, key, point_colors: Optional[jnp.ndarray] = None
    ) -> Dict[str, Any]:
        """Initialize parameters.

        ``point_colors`` (uint8 ``[V, 3]`` or ``[V, 4]``) seeds field
        channels 1..3 with colors mapped to [-1, 1] and channel 0 with
        alpha (or 1), matching ``model.py:337-343, 380-386``.
        """
        cfg = self.config
        num_vertices = self.mesh.num_vertices
        keys = jax.random.split(key, 6)
        field = jax.random.uniform(
            keys[0],
            (num_vertices, cfg.field_dim),
            jnp.float32,
            minval=-1e-4,
            maxval=1e-4,
        )
        if cfg.initialize_colors and point_colors is not None:
            colors = jnp.asarray(point_colors).astype(jnp.float32)
            rgb = colors[:, :3] * 2.0 / 255.0 - 1.0
            field = field.at[:, 1:4].set(rgb)
            if colors.shape[1] >= 4:
                alpha = colors[:, 3] * 2.0 / 255.0 - 1.0
                field = field.at[:, 0].set(alpha)
            else:
                field = field.at[:, 0].set(1.0)
        params: Dict[str, Any] = {
            "tetrahedra_field": field,
            "mlp_base": nn.mlp_init(
                keys[1], self._mlp_in_dim, cfg.num_density_layers, cfg.hidden_size
            ),
            "mlp_head": nn.mlp_init(
                keys[2], self._head_in_dim, cfg.num_color_layers, cfg.hidden_size
            ),
            "field_output_color": nn.linear_init(keys[3], cfg.hidden_size, 3),
            "field_output_density": nn.linear_init(keys[4], cfg.hidden_size, 1),
        }
        if cfg.appearance_embed_dim > 0:
            params["appearance_embedding"] = jax.random.normal(
                keys[5], (self.num_train_images, cfg.appearance_embed_dim)
            )
        # NOTE: no per-cell occupancy PARAMETER. The reference registers a
        # ``tetrahedra_occupancy`` buffer it never reads (``model.py:
        # 256-265``); here the live per-cell density EMA is trainer state
        # (``Trainer._occ``, persisted as ``occupancy.npy`` next to the
        # checkpoint) — it receives no gradient, so keeping it in the
        # param tree would only drag dead optimizer moments (~80 MB at
        # dense-1M scale) through every step and checkpoint.
        return params

    # --------------------------------------------------------------- helpers
    def _field_mlps_remat(
        self, params, field_values, directions, camera_indices, train
    ):
        """MLP heads under ``jax.checkpoint``: their activations at
        [R, S, 128] are the largest residuals of the step (4GB each at
        32K rays — an immediate OOM; several GB of HBM write+read traffic
        even at 8K), while recomputing them in the backward is nearly
        free (the MXU is idle most of the step).

        With ``fused_mlps`` the whole stack instead runs as one Pallas
        kernel whose activations live in VMEM only — strictly better
        than remat (no HBM residuals AND no XLA activation traffic in
        either pass)."""
        if self.config.fused_mlps and self.config.input_fourier_frequencies == 0:
            return self._field_mlps_fused(
                params, field_values, directions, camera_indices, train
            )
        remat = self.config.remat_mlps
        if remat == "auto":
            # Remat only when the saved activations would actually
            # pressure HBM: under ~4M (ray, sample) points the residuals
            # total <2.5 GB and skipping the recompute saves a measured
            # ~5 ms/step at [8K, 257] (benchmarks/microbench_mlp_bwd.py);
            # above it (e.g. 32K-ray batches) the residuals OOM first.
            remat = (
                field_values.shape[0] * field_values.shape[1] >= 4_000_000
            )
        if not remat:
            return self._field_mlps(
                params, field_values, directions, camera_indices, train
            )
        fn = jax.checkpoint(
            lambda p, fv, d, ci: self._field_mlps(p, fv, d, ci, train)
        )
        return fn(params, field_values, directions, camera_indices)

    def _field_mlps_fused(
        self, params, field_values, directions, camera_indices, train
    ):
        """Fully-fused Pallas MLP stack (``ops/pallas_mlp.py``).

        The per-ray first-head-layer contribution (direction encoding
        [+ appearance embedding] rows of the head weight + its bias) is
        computed here at [R, H] cost and broadcast over samples inside
        the kernel; the base-feature rows go in as a separate operand.
        Semantics match :meth:`_field_mlps` (reference
        ``model.py:602-621``)."""
        from ..ops.pallas_mlp import fused_field_mlps

        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        head0 = params["mlp_head"][0]
        w0, b0 = head0["kernel"], head0["bias"]
        d_dir = self._dir_enc_dim
        hdim = cfg.hidden_size
        dir_enc = nerf_encoding(directions, 4, 0.0, 4.0)  # [R, 27]
        head_dir = (
            jnp.dot(
                dir_enc.astype(dtype),
                w0[:d_dir].astype(dtype),
                preferred_element_type=jnp.float32,
            )
            + b0
        )
        if cfg.appearance_embed_dim > 0:
            emb = params["appearance_embedding"]
            if train and camera_indices is not None:
                app = emb[camera_indices]  # [R, D]
            else:
                app = jnp.broadcast_to(
                    emb.mean(axis=0), (dir_enc.shape[0], emb.shape[1])
                )
            head_dir = head_dir + jnp.dot(
                app.astype(dtype),
                w0[d_dir + hdim :].astype(dtype),
                preferred_element_type=jnp.float32,
            )
        weights = []
        for layer in params["mlp_base"]:
            weights += [layer["kernel"], layer["bias"]]
        weights += [
            params["field_output_density"]["kernel"],
            params["field_output_density"]["bias"],
            w0[d_dir : d_dir + hdim],
        ]
        for layer in params["mlp_head"][1:]:
            weights += [layer["kernel"], layer["bias"]]
        weights += [
            params["field_output_color"]["kernel"],
            params["field_output_color"]["bias"],
        ]
        static = (
            len(params["mlp_base"]),
            len(params["mlp_head"]),
            cfg.compute_dtype,
            None,
        )
        rgb, density = fused_field_mlps(
            static, field_values, head_dir, *weights
        )
        return rgb, density[..., 0]

    def _density_mlp(
        self, params, field_values, directions, camera_indices, train
    ):
        """Density only — the coarse PDF round never consumes rgb.

        The fused kernel gets an explicit head-free variant (an opaque
        kernel can't be DCE'd); the XLA path just discards rgb and lets
        XLA prune the color head."""
        cfg = self.config
        if cfg.fused_mlps and cfg.input_fourier_frequencies == 0:
            from ..ops.pallas_mlp import fused_density_mlp

            weights = []
            for layer in params["mlp_base"]:
                weights += [layer["kernel"], layer["bias"]]
            weights += [
                params["field_output_density"]["kernel"],
                params["field_output_density"]["bias"],
            ]
            static = (len(params["mlp_base"]), cfg.compute_dtype, None)
            return fused_density_mlp(static, field_values, *weights)[..., 0]
        return self._field_mlps_remat(
            params, field_values, directions, camera_indices, train
        )[1]

    def density_at(self, params, field_values):
        """Density head only, at raw interpolated feature vectors
        ``[..., F]`` — no directions, no color head. Used by the
        occupancy refresh to evaluate opacity at every cell centroid
        (the centroid's interpolated feature is the exact barycentric
        mean of its 4 vertex features)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        x = field_values
        if cfg.input_fourier_frequencies > 0:
            x = nerf_encoding(
                x,
                cfg.input_fourier_frequencies,
                0.0,
                float(cfg.input_fourier_frequencies),
            )
        base_out = nn.mlp_apply(
            params["mlp_base"], x, out_activation=jax.nn.relu,
            compute_dtype=dtype, final_dtype=dtype,
        )
        return jax.nn.softplus(
            nn.linear_apply(params["field_output_density"], base_out, dtype)[
                ..., 0
            ]
        ).astype(jnp.float32)

    def _field_mlps(self, params, field_values, directions, camera_indices, train):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        x = field_values
        if cfg.input_fourier_frequencies > 0:
            x = nerf_encoding(
                x,
                cfg.input_fourier_frequencies,
                0.0,
                float(cfg.input_fourier_frequencies),
            )
        base_out = nn.mlp_apply(
            params["mlp_base"], x, out_activation=jax.nn.relu,
            compute_dtype=dtype, final_dtype=dtype,
        )
        density = jax.nn.softplus(
            nn.linear_apply(params["field_output_density"], base_out, dtype)[..., 0]
        )
        dir_enc = nerf_encoding(directions, 4, 0.0, 4.0)  # [R, 27]
        dir_enc = jnp.broadcast_to(
            dir_enc[:, None, :], (*base_out.shape[:2], dir_enc.shape[-1])
        )
        head_in = [dir_enc.astype(dtype), base_out.astype(dtype)]
        if cfg.appearance_embed_dim > 0:
            emb = params["appearance_embedding"]
            if train and camera_indices is not None:
                app = emb[camera_indices]  # [R, D]
            else:
                app = jnp.broadcast_to(
                    emb.mean(axis=0), (base_out.shape[0], emb.shape[1])
                )
            app = jnp.broadcast_to(
                app[:, None, :], (*base_out.shape[:2], app.shape[-1])
            )
            head_in.append(app.astype(dtype))
        head_out = nn.mlp_apply(
            params["mlp_head"],
            jnp.concatenate(head_in, axis=-1),
            out_activation=jax.nn.relu,
            compute_dtype=dtype,
            final_dtype=dtype,
        )
        rgb = jax.nn.sigmoid(
            nn.linear_apply(params["field_output_color"], head_out, dtype)
        )
        return rgb.astype(jnp.float32), density.astype(jnp.float32)

    def _background(self, key, num_rays):
        cfg = self.config
        if cfg.background_color == "white":
            return jnp.ones((num_rays, 3), jnp.float32)
        if cfg.background_color == "black":
            return jnp.zeros((num_rays, 3), jnp.float32)
        if cfg.background_color == "random":
            if key is None:
                return jnp.full((num_rays, 3), 0.5, jnp.float32)
            return jax.random.uniform(key, (num_rays, 3), jnp.float32)
        raise NotImplementedError(cfg.background_color)

    # --------------------------------------------------------------- forward
    def get_outputs(
        self,
        params: Dict[str, Any],
        rays: RayBundle,
        rng: Optional[jax.Array] = None,
        train: bool = False,
        mesh: Optional[TetrahedraMesh] = None,
        max_steps: Optional[int] = None,
        short_steps: Optional[int] = None,
        num_samples: Optional[int] = None,
        num_fine_samples: Optional[int] = None,
        cached_march: Optional["FusedMarch"] = None,
        occ_depth_cap=None,
        bucket_steps=None,
    ) -> Dict[str, jnp.ndarray]:
        """Forward pass. Pass ``mesh`` explicitly inside jitted functions:
        a closed-over mesh becomes an HLO constant, embedding hundreds of
        MB of tables into every compiled executable.

        ``max_steps``/``short_steps``/``bucket_steps`` override the
        configured traversal bounds without mutating the config (used by
        ``Trainer.tune_traversal_steps``; ``bucket_steps`` is the
        ascending tuple of ``ray_buckets - 1`` inner quantile-bucket
        bounds, the deepest bucket always shades at ``max_steps``). The
        output's ``traversal_overflow`` flags rays whose march was
        truncated by the bound — a nonzero count means far geometry is
        being dropped and the bound should be raised.

        ``num_samples``/``num_fine_samples`` override the sample budget
        (render-speed knob; ``num_fine_samples=0`` skips the PDF round).
        ``cached_march`` re-shades a previously computed march of the
        SAME rays against the current field instead of re-marching —
        the static-camera viewer path.
        """
        mesh = mesh if mesh is not None else self.mesh
        cfg = self.config
        max_steps = max_steps or cfg.max_intersected_triangles
        if cfg.ray_buckets >= 2 and (
            cached_march is None or cached_march.stream is not None
        ):
            if cached_march is not None:
                max_steps = cached_march.t1.shape[1]
            bounds = self._bucket_bounds(
                max_steps, short_steps, bucket_steps
            )
            if any(b < max_steps for b in bounds):
                return self._get_outputs_bucketed(
                    params, rays, rng, train, mesh, bounds,
                    num_samples, num_fine_samples, cached_march,
                    occ_depth_cap,
                )
            # Every bucket at the full bound (e.g. a depth-sorted viewer
            # chunk pinned to its own bound): bucketing is a no-op —
            # skip the sort/slice/concat and the K separate compiles.
        return self._forward(
            params, rays, rng, train, mesh, max_steps,
            num_samples, num_fine_samples, cached_march, occ_depth_cap,
        )

    def _bucket_bounds(self, max_steps, short_steps, bucket_steps):
        """The K ascending static interval bounds for quantile-bucketed
        shading (deepest = ``max_steps``). Priority: explicit
        ``bucket_steps`` (trainer-tuned) > ``short_steps`` /
        ``config.bucket_short_steps`` (K=2 legacy / viewer pin,
        interpolated linearly for K>2) > an untuned linear split."""
        cfg = self.config
        k_buckets = cfg.ray_buckets
        if bucket_steps is not None:
            inner = [int(b) for b in bucket_steps][: k_buckets - 1]
        else:
            short = short_steps or cfg.bucket_short_steps
            if short is None:
                inner = [
                    max(16, max_steps * (k + 1) // k_buckets)
                    for k in range(k_buckets - 1)
                ]
            else:
                inner = [
                    int(short + (max_steps - short) * k / max(k_buckets - 1, 1))
                    for k in range(k_buckets - 1)
                ]
        # Clamp into (0, max_steps], force nondecreasing.
        bounds, cur = [], 16
        for b in inner:
            cur = min(max(b, cur), max_steps)
            bounds.append(cur)
        bounds.append(max_steps)
        return tuple(bounds)

    def _get_outputs_bucketed(
        self, params, rays, rng, train, mesh, bounds,
        num_samples=None, num_fine_samples=None, cached_march=None,
        occ_depth_cap=None,
    ):
        """K-bucket shading keyed by each ray's TRUE crossing count.

        One geometry march for the whole batch at the full bound
        (per-ray compaction already makes the march's cost track actual
        crossings); rays are then sorted by ``num_valid``, split into K
        equal quantile buckets, and bucket k's downstream stages —
        endpoint features, blend, the [R, S, T]-shaped sample-interval
        one-hot matmuls, and their backwards — run at its own static
        bound ``bounds[k]``. With ``bucket_adaptive_samples`` the sample
        budget scales with the bound too (per-crossing sample density
        never drops below the full budget's — the policy the depth-
        sorted viewer refine validated at >30 dB, ``Trainer.
        adaptive_budget``), so shallow rays stop paying full-depth
        [R, S, ·] MLP/interp rounds for a handful of crossed cells.
        Every [·, T]-shaped tensor otherwise pads to the batch max —
        this trims the T- and S-proportional work the static bound
        cannot (the crossing tail pins it; docs/RESULTS.md round 3).
        Truncation by an inner bound (bucket rays deeper than
        ``bounds[k]``) is surfaced via ``traversal_overflow`` like any
        other bound."""
        cfg = self.config
        origins = jnp.asarray(rays.origins)
        directions = jnp.asarray(rays.directions)
        num_rays = origins.shape[0]
        k_buckets = len(bounds)
        max_steps = bounds[-1]
        if cached_march is not None:
            res = cached_march
        else:
            res = march_features(
                mesh,
                None,  # geometry only; features are computed per bucket
                origins,
                directions,
                max_steps,
                hops=cfg.traversal_hops,
                use_occupancy=cfg.use_occupancy_field,
                occ_threshold=cfg.occupancy_threshold,
                compact_stages=cfg.march_compaction,
                compact_ratio=cfg.march_compact_ratio,
                occ_depth_cap=occ_depth_cap,
            )
        if res.stream is None:
            raise ValueError("ray_buckets >= 2 requires traversal_hops=1")
        order = jnp.argsort(res.num_valid)
        inv_order = jnp.argsort(order)
        keys = (
            jax.random.split(rng, k_buckets)
            if rng is not None
            else (None,) * k_buckets
        )
        n_coarse = num_samples if num_samples is not None else cfg.num_samples
        n_fine = (
            num_fine_samples
            if num_fine_samples is not None
            else cfg.num_fine_samples
        )

        def sub_bundle(idx):
            cam = rays.camera_indices
            return RayBundle(
                origins=origins[idx],
                directions=directions[idx],
                camera_indices=cam[idx] if cam is not None else None,
            )

        plan = []
        for k in range(k_buckets):
            lo = num_rays * k // k_buckets
            hi = num_rays * (k + 1) // k_buckets
            if hi == lo:
                continue
            t_k = bounds[k]
            if cfg.bucket_adaptive_samples:
                ns_k = scaled_budget(n_coarse, t_k, max_steps)
                nf_k = scaled_budget(n_fine, t_k, max_steps)
            else:
                ns_k, nf_k = n_coarse, n_fine
            plan.append((k, order[lo:hi], t_k, ns_k, nf_k))
        if (
            cfg.bucket_merge_mlps
            and not (train and cfg.grad_stream_budget_per_ray)
            and cfg.field_stream_dtype in (None, "float32")
            and not cfg.fused_mlps
        ):
            outs = self._shade_buckets_merged(
                params, res, plan, keys, sub_bundle, train
            )
        else:
            # _forward's cached-march branch computes the bucket's
            # endpoint features (with the per-bucket gradient budget);
            # the occupancy cap was already applied in the shared march.
            outs = [
                self._forward(
                    params, sub_bundle(idx), keys[k], train, mesh, t_k,
                    ns_k, nf_k, cached_march=_slice_march(res, idx, t_k),
                )
                for k, idx, t_k, ns_k, nf_k in plan
            ]
        return {
            k: jnp.concatenate([o[k] for o in outs], axis=0)[inv_order]
            for k in outs[0]
        }

    def _shade_buckets_merged(
        self, params, res, plan, keys, sub_bundle, train
    ):
        """Bucketed shading with the MLP calls MERGED across buckets.

        The per-bucket path launches 2 MLP rounds x K buckets of small
        [R_k, S_k, ·] calls — 16 kernel chains at K=8, each with its own
        weight-gradient reductions in the backward. Samples are
        pointwise for the MLPs, so all buckets' samples can be flattened
        to one [ΣR_k·S_k, 1, F] batch per round: 2 MLP chains total,
        one set of weight-grad matmuls, identical math per sample
        (directions/camera indices are repeated per sample). Interp,
        PDF resampling, and rendering stay per-bucket (their shapes are
        bucket-bound-dependent). Gated by ``config.bucket_merge_mlps``;
        falls back to per-bucket ``_forward`` when the gradient-budget /
        bf16-stream / fused-MLP paths are active (those thread per-
        bucket state through the MLP calls)."""
        cfg = self.config
        sg = jax.lax.stop_gradient
        field = params["tetrahedra_field"]

        def flatten(chunks_fv, chunks_dir, chunks_cam):
            fv = jnp.concatenate(
                [c.reshape(-1, 1, c.shape[-1]) for c in chunks_fv], axis=0
            )
            dirs = jnp.concatenate(chunks_dir, axis=0)
            cams = (
                jnp.concatenate(chunks_cam, axis=0)
                if chunks_cam[0] is not None
                else None
            )
            return fv, dirs, cams

        def split(flat, shapes):
            # ``flat`` is [N, ...trailing] with N = Σ r*s rows.
            outs, off = [], 0
            for r, s in shapes:
                outs.append(
                    flat[off : off + r * s].reshape(r, s, *flat.shape[1:])
                )
                off += r * s
            return outs

        # Phase A: per-bucket march slice + endpoint features + coarse
        # sampling + interpolation (everything bound-shaped).
        B = []
        for k, idx, t_k, ns_k, nf_k in plan:
            bundle = sub_bundle(idx)
            res_k = _slice_march(res, idx, t_k)
            res_k = res_k._replace(
                feats=endpoint_features(
                    field, res_k.stream, counts=res_k.num_valid + 4
                )
            )
            if keys[k] is not None:
                k_coarse, k_fine, k_bg = jax.random.split(keys[k], 3)
            else:
                k_coarse = k_fine = k_bg = None
            nears, fars, first_kept, num_kept, ray_mask = ray_bounds(res_k)
            num_rays_k = bundle.origins.shape[0]
            bins01 = stratified_bins(
                k_coarse if train else None, num_rays_k, ns_k
            )
            euclid = nears[:, None] + bins01 * (fars - nears)[:, None]
            if cfg.use_biased_sampler:
                euclid = biased_warp_range(
                    res_k, first_kept, num_kept, nears, fars, euclid
                )
            spacing = (euclid - nears[:, None]) / (fars - nears)[:, None]
            b = dict(
                bundle=bundle, res=res_k, nears=nears, fars=fars,
                ray_mask=ray_mask, euclid=euclid, spacing=spacing,
                k_fine=k_fine, k_bg=k_bg, nf=nf_k,
            )
            b["dist"], b["deltas"], b["smask"], b["fv"] = self._run_field(
                res_k, euclid, ray_mask
            )
            B.append(b)

        dirs_of = lambda b, s: jnp.repeat(b["bundle"].directions, s, axis=0)
        cams_of = lambda b, s: (
            jnp.repeat(b["bundle"].camera_indices, s, axis=0)
            if b["bundle"].camera_indices is not None
            else None
        )
        # Buckets with a zero fine budget shade their coarse samples
        # directly — they take no part in the coarse-density/PDF round.
        Bf = [b for b in B if b["nf"] > 0]
        if Bf:
            # Phase B: ONE merged coarse density pass (stop-gradiented —
            # the coarse round only shapes the PDF, as in _forward).
            shapes = [tuple(b["fv"].shape[:2]) for b in Bf]
            flat, dirs, cams = flatten(
                [b["fv"] for b in Bf],
                [dirs_of(b, s) for b, (_, s) in zip(Bf, shapes)],
                [cams_of(b, s) for b, (_, s) in zip(Bf, shapes)],
            )
            dens_flat = self._density_mlp(
                sg(params), sg(flat), dirs, cams, train
            )
            dens = split(dens_flat[:, 0], shapes)
            # Phase C: per-bucket PDF resample + fine interpolation.
            for b, d_c in zip(Bf, dens):
                d_c = d_c.reshape(b["dist"].shape)
                d_c = jnp.where(b["smask"], d_c, 0.0)
                weights_c = render_weights(d_c, b["deltas"])
                fine_spacing = pdf_sample(
                    b["k_fine"] if train else None,
                    b["spacing"],
                    jax.lax.stop_gradient(weights_c),
                    b["nf"],
                    include_original=True,
                )
                b["euclid"] = (
                    b["nears"][:, None]
                    + fine_spacing * (b["fars"] - b["nears"])[:, None]
                )
                b["spacing"] = fine_spacing
                (
                    b["dist"], b["deltas"], b["smask"], b["fv"],
                ) = self._run_field(b["res"], b["euclid"], b["ray_mask"])

        # Phase D: ONE merged full MLP pass over every bucket's samples.
        shapes = [tuple(b["fv"].shape[:2]) for b in B]
        flat, dirs, cams = flatten(
            [b["fv"] for b in B],
            [dirs_of(b, s) for b, (_, s) in zip(B, shapes)],
            [cams_of(b, s) for b, (_, s) in zip(B, shapes)],
        )
        rgb_flat, dens_flat = self._field_mlps_remat(
            params, flat, dirs, cams, train
        )
        rgbs = split(rgb_flat[:, 0], shapes)
        denss = split(dens_flat[:, 0], shapes)

        # Phase E: per-bucket gradient scaling + volume rendering.
        outs = []
        for b, rgb, density in zip(B, rgbs, denss):
            density = jnp.where(
                b["smask"], density.reshape(b["dist"].shape), 0.0
            )
            if cfg.use_gradient_scaling:
                s_mid = b["spacing"][:, 1:] + b["spacing"][:, :-1]
                scaling = jnp.clip(jnp.square(s_mid), 0.0, 1.0)
                rgb, density = _gradient_scaler(rgb, density, scaling)
            weights = render_weights(density, b["deltas"])
            num_rays_k = b["bundle"].origins.shape[0]
            if cfg.background_color == "last_sample":
                background = rgb[:, -1, :]
            else:
                background = self._background(b["k_bg"], num_rays_k)
            rgb_out, acc, depth = render_rgb_depth_acc(
                weights,
                rgb,
                b["dist"],
                background_rgb=background,
                depth_method=cfg.depth_method,
            )
            ray_mask = b["ray_mask"]
            rgb_out = jnp.where(ray_mask[:, None], rgb_out, background)
            acc = jnp.where(ray_mask, acc, 0.0)
            depth = jnp.where(ray_mask & (acc > 0), depth, cfg.far_plane)
            outs.append(
                {
                    "rgb": rgb_out,
                    "accumulation": acc[:, None],
                    "depth": depth[:, None],
                    "ray_mask": ray_mask,
                    "traversal_overflow": b["res"].overflow,
                }
            )
        return outs

    def _run_field(self, res, bins, ray_mask):
        """Coarse/fine interpolation round shared by the forward paths:
        midpoint distances + deltas + per-sample features."""
        cfg = self.config
        distances = (bins[:, 1:] + bins[:, :-1]) / 2.0
        deltas = bins[:, 1:] - bins[:, :-1]
        field_values, smask = sample_features(
            res,
            distances,
            ray_mask,
            use_matmul=_interp_backend(cfg.interp_mode),
            compute_dtype=jnp.dtype(cfg.compute_dtype),
        )
        return distances, deltas, smask, field_values

    def _forward(
        self,
        params: Dict[str, Any],
        rays: RayBundle,
        rng: Optional[jax.Array],
        train: bool,
        mesh: TetrahedraMesh,
        max_steps: int,
        num_samples: Optional[int] = None,
        num_fine_samples: Optional[int] = None,
        cached_march: Optional[FusedMarch] = None,
        occ_depth_cap=None,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        n_coarse = num_samples if num_samples is not None else cfg.num_samples
        n_fine = (
            num_fine_samples
            if num_fine_samples is not None
            else cfg.num_fine_samples
        )
        origins = jnp.asarray(rays.origins)
        directions = jnp.asarray(rays.directions)
        num_rays = origins.shape[0]
        if rng is not None:
            k_coarse, k_fine, k_bg = jax.random.split(rng, 3)
        else:
            k_coarse = k_fine = k_bg = None
        sample_key = k_coarse if train else None

        # One fused march per forward pass: traversal intervals + endpoint
        # features. Both the coarse and fine sampling rounds reuse it (the
        # reference re-runs find_visited_cells + interpolate per round,
        # ``model.py:560-600``). A cached march (same rays, earlier field)
        # is re-shaded against the current field instead.
        grad_budget = (
            cfg.grad_stream_budget_per_ray * num_rays
            if train and cfg.grad_stream_budget_per_ray
            else None
        )
        stream_dtype = (
            None
            if cfg.field_stream_dtype in (None, "float32")
            else cfg.field_stream_dtype
        )
        if cached_march is not None:
            res = cached_march._replace(
                feats=endpoint_features(
                    params["tetrahedra_field"],
                    cached_march.stream,
                    counts=cached_march.num_valid + 4,
                    grad_budget=grad_budget,
                    stream_dtype=stream_dtype,
                )
            )
        else:
            res = march_features(
                mesh,
                params["tetrahedra_field"],
                origins,
                directions,
                max_steps,
                hops=cfg.traversal_hops,
                use_occupancy=cfg.use_occupancy_field,
                occ_threshold=cfg.occupancy_threshold,
                compact_stages=cfg.march_compaction,
                compact_ratio=cfg.march_compact_ratio,
                grad_stream_budget=grad_budget,
                occ_depth_cap=occ_depth_cap,
                stream_dtype=stream_dtype,
            )
        nears, fars, first_kept, num_kept, ray_mask = ray_bounds(res)

        # --- coarse sampling ------------------------------------------------
        bins01 = stratified_bins(sample_key, num_rays, n_coarse)
        euclid_bins = nears[:, None] + bins01 * (fars - nears)[:, None]
        if cfg.use_biased_sampler:
            euclid_bins = biased_warp_range(
                res, first_kept, num_kept, nears, fars, euclid_bins
            )
        spacing_bins = (euclid_bins - nears[:, None]) / (fars - nears)[:, None]

        def run_field(bins):
            distances = (bins[:, 1:] + bins[:, :-1]) / 2.0
            deltas = bins[:, 1:] - bins[:, :-1]
            field_values, smask = sample_features(
                res,
                distances,
                ray_mask,
                use_matmul=_interp_backend(cfg.interp_mode),
                compute_dtype=jnp.dtype(cfg.compute_dtype),
            )
            return distances, deltas, smask, field_values

        if n_fine > 0:
            # The coarse round exists only to shape the PDF resampler,
            # whose weights are stop-gradiented below (reference detaches
            # them the same way via nerfstudio's PDFSampler). Cutting
            # gradients at the *inputs* — not just the output — makes the
            # dead coarse backward explicit so no autodiff rule ever
            # fires for it (DCE of a stop-gradiented output is otherwise
            # left to XLA's discretion).
            sg = jax.lax.stop_gradient
            distances, deltas, smask, field_values = run_field(euclid_bins)
            density_c = self._density_mlp(
                sg(params), sg(field_values), directions,
                rays.camera_indices, train
            )
            density_c = jnp.where(smask, density_c, 0.0)
            weights_c = render_weights(density_c, deltas)
            fine_spacing = pdf_sample(
                k_fine if train else None,
                spacing_bins,
                jax.lax.stop_gradient(weights_c),
                n_fine,
                include_original=True,
            )
            euclid_bins = (
                nears[:, None] + fine_spacing * (fars - nears)[:, None]
            )
            spacing_bins = fine_spacing

        distances, deltas, smask, field_values = run_field(euclid_bins)
        rgb, density = self._field_mlps_remat(
            params, field_values, directions, rays.camera_indices, train
        )
        density = jnp.where(smask, density, 0.0)

        if cfg.use_gradient_scaling:
            # Spacing-domain distance doubles as distance-to-object-center
            # (reference ``model.py:625-630``).
            s_mid = spacing_bins[:, 1:] + spacing_bins[:, :-1]
            scaling = jnp.clip(jnp.square(s_mid), 0.0, 1.0)
            rgb, density = _gradient_scaler(rgb, density, scaling)

        weights = render_weights(density, deltas)
        if cfg.background_color == "last_sample":
            background = rgb[:, -1, :]
        else:
            background = self._background(k_bg, num_rays)
        rgb_out, acc, depth = render_rgb_depth_acc(
            weights,
            rgb,
            distances,
            background_rgb=background,
            depth_method=cfg.depth_method,
        )

        rgb_out = jnp.where(ray_mask[:, None], rgb_out, background)
        acc = jnp.where(ray_mask, acc, 0.0)
        depth = jnp.where(ray_mask & (acc > 0), depth, cfg.far_plane)
        out = {
            "rgb": rgb_out,
            "accumulation": acc[:, None],
            "depth": depth[:, None],
            "ray_mask": ray_mask,
            "traversal_overflow": res.overflow,
        }
        if grad_budget is not None and res.stream is not None:
            counts = jnp.minimum(
                res.num_valid + 4, res.stream.vids.shape[1]
            )
            # Rays whose valid prefix ends beyond the budget lose
            # (part of) their field gradient this step — surfaced,
            # never silent (mirrors ``traversal_overflow``).
            out["grad_stream_dropped"] = jnp.cumsum(counts) > grad_budget
        return out

    # ------------------------------------------------------------------ loss
    def loss(self, outputs, batch) -> jnp.ndarray:
        """MSE on RGB — the reference's only loss (``model.py:665-674``)."""
        image = batch["image"] if isinstance(batch, dict) else batch
        return jnp.mean(jnp.square(outputs["rgb"] - image))


def replace_config(config: TetrahedraNerfConfig, **kwargs) -> TetrahedraNerfConfig:
    return dataclasses.replace(config, **kwargs)
