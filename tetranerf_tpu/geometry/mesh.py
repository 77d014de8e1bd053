"""Tetrahedral mesh preprocessing and the device-side mesh structure.

This is the TPU-native replacement for the reference's OptiX acceleration
structure (``src/tetrahedra_tracer.cpp:191-340``). The reference dedupes the
four faces of every tetrahedron into a triangle soup with a
triangle->(tet_a, tet_b) adjacency map and builds an OptiX GAS over it; rays
are traced by collecting unsorted triangle hits and sorting/pairing them on
the device (``src/optix/optix_trace_rays.cu``).

Here we precompute, once on the host:

- ``neighbors[C, 4]``: for every cell, the cell across the face opposite
  vertex ``k`` (-1 on the boundary). Traversal becomes neighbor *marching*
  which emits intervals already sorted — no sort, no dedupe, no
  power-of-two hit cap.
- ``planes[C, 4, 4]``: barycentric plane table. Row ``k`` holds ``(n, d)``
  with ``bary_k(x) = n·x + d``; it is 1 at vertex ``k`` and 0 on the
  opposite face. Computed as the inverse of the homogeneous vertex matrix,
  so barycentrics anywhere along a ray are a fused multiply-add away —
  replacing both the OptiX 2D hit barycentrics + ``combine_indices`` lift
  (``optix_trace_rays.cu:39-75``) and the entry/exit lerp in
  ``find_matched_cells_kernel`` (``src/tetrahedra_tracer.cu:150-156``).
- ``hull_eqs[H, 4]``: outward half-space equations of the convex hull for
  the slab test that yields per-ray [t_enter, t_exit] and the entry facet.
- ``hull_cells[H]`` / ``vertex_cells[V]``: point-location seeds.

All device arrays live in a :class:`TetrahedraMesh` pytree that can be
passed straight into ``jax.jit``-ed functions and replicated/sharded with
``jax.sharding``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

try:  # Native C++ fast path for adjacency extraction (csrc/tetra_geom.cpp).
    from . import native as _native
except Exception:  # pragma: no cover - native lib is optional
    _native = None


@dataclasses.dataclass(frozen=True)
class TetrahedraMesh:
    """Device-side tetrahedral mesh (a JAX pytree).

    Attributes:
        vertices: ``f32[V, 3]`` vertex positions.
        cells: ``i32[C, 4]`` vertex indices per tetrahedron.
        neighbors: ``i32[C, 4]`` adjacent cell across the face opposite
            vertex ``k``; -1 at the boundary.
        planes: ``f32[C, 4, 4]`` barycentric plane rows ``(nx, ny, nz, d)``.
        hull_eqs: ``f32[H, 4]`` outward convex-hull half-spaces
            (``n·x + d <= 0`` inside).
        hull_cells: ``i32[H]`` a cell incident to each hull facet (walk seed).
        vertex_cells: ``i32[V]`` some cell incident to each vertex.
        march_table: ``f32[C, 64]`` packed per-cell traversal row — planes
            (16 f32) | neighbors (4 i32 bit-cast) | vertex ids (4 i32
            bit-cast) | occupancy (1 f32, column 24, see
            :meth:`with_occupancy`) | zero padding to 64 floats (rows
            narrower than 64 floats gather ~2x slower on TPU — measured
            21.5 vs 47.3 M rows/s in the sequential neighbor chase).
            Random-row gathers on TPU are row-rate-bound, so the hot
            marching loop fetches ONE packed row per step instead of
            three separate tables; the occupancy value rides along for
            free in the already-fetched row.
        march_table2: ``f32[C, 128]`` two-hop row: five 25-float blocks —
            the cell's own row (planes 16 | neighbors 4 | vertex ids 4 |
            occupancy 1) followed by its 4 face neighbors' rows — padded
            to 128. 128-float rows gather at the SAME ~100M rows/s row
            rate as 64-float rows (measured, r5 width sweep), so one
            fetch advances the march TWO cells — halving the row count
            of its dominant sequential gather chain. Occupancy rides in
            column 24 of every block (see :meth:`with_occupancy`).
        skip_table: ``f32[G, G, G, 8]`` empty-space skip grid (built from
            the occupancy EMA by :mod:`tetranerf_tpu.ops.skip_grid`; a
            zero-size array disables skipping). Column 0 is the safe
            sphere-trace advance distance, column 1 the localization
            anchor cell (i32 bit-cast).
        skip_meta: ``f32[8]`` skip-grid geometry: ``lo`` (3) | ``1/h``
            (3) | ``h_min`` | 0.
    """

    vertices: np.ndarray
    cells: np.ndarray
    neighbors: np.ndarray
    planes: np.ndarray
    hull_eqs: np.ndarray
    hull_cells: np.ndarray
    vertex_cells: np.ndarray
    march_table: np.ndarray
    march_table2: np.ndarray
    skip_table: np.ndarray
    skip_meta: np.ndarray

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    def with_occupancy(self, occupancy) -> "TetrahedraMesh":
        """New mesh with the per-cell occupancy column (``f32[C]``)
        written into the packed march rows. Cheap on device (one dense
        column update); the marcher reads it for transmittance-based
        early termination (``src/tetrahedra_tracer.cu:55-113`` built its
        scatter-EMA for exactly this, but the reference never wired it).

        With a two-hop table present, every block's occupancy column is
        updated too (the 4 neighbor blocks carry the NEIGHBORS' values —
        a ``[C, 4]`` gather, amortized over the update cadence)."""
        import dataclasses as _dc

        import jax.numpy as _jnp

        occ = _jnp.asarray(occupancy, _jnp.float32)
        table = _jnp.asarray(self.march_table).at[:, 24].set(occ)
        kwargs = {"march_table": table}
        if self.march_table2.shape[0]:
            kwargs["march_table2"] = _two_hop_occ_update()(
                _jnp.asarray(self.march_table2),
                occ,
                _jnp.asarray(self.neighbors),
            )
        return _dc.replace(self, **kwargs)

    def on_device(self) -> "TetrahedraMesh":
        """Mesh with every table as a jax array.

        ``build_mesh`` returns HOST (numpy) tables so a long-lived mesh
        never pins device HBM; ops that index tables with traced values
        (scan/while bodies) canonicalize through this at entry. Under
        ``jit`` the fields are already tracers and this is free; outside
        ``jit`` it transfers per call — long-lived consumers (Trainer,
        tracer facade) should ``jax.device_put`` once instead.
        """
        import dataclasses as _dc

        import jax.numpy as _jnp

        return _dc.replace(
            self,
            **{
                f.name: _jnp.asarray(getattr(self, f.name))
                for f in _dc.fields(self)
            },
        )

    def slim(self, keep_two_hop: bool = False) -> "TetrahedraMesh":
        """Drop the arrays the fused hot path never reads.

        ``planes``/``neighbors``/``cells`` are packed inside
        ``march_table`` rows, and ``vertex_cells``/``march_table2`` serve
        only the point-locator / two-hop marcher — together ~40%
        of the mesh's device bytes on top of the march table. The
        trainer ships the slim mesh to devices; the full mesh stays on
        host for the parity APIs (``locate_points``, ``match_samples``,
        ``find_tetrahedra``). Zero-size placeholders keep the pytree
        structure (and jit signatures) unchanged.

        ``keep_two_hop`` (for ``traversal_hops=2``) keeps
        ``march_table2`` AND ``neighbors`` (the occupancy column write
        updates every block's occ value via a neighbor gather).
        """
        import dataclasses as _dc

        import numpy as _np

        empty = lambda shape, dt: _np.zeros(shape, dt)
        repl = dict(
            cells=empty((0, 4), _np.int32),
            neighbors=empty((0, 4), _np.int32),
            planes=empty((0, 4, 4), _np.float32),
            vertex_cells=empty((0,), _np.int32),
            march_table2=empty((0, 128), _np.float32),
        )
        if keep_two_hop:
            repl.pop("march_table2")
            repl.pop("neighbors")
        return _dc.replace(self, **repl)

    def tree_flatten(self):
        children = tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)


import jax.tree_util as _jtu  # noqa: E402

_jtu.register_pytree_node(
    TetrahedraMesh, TetrahedraMesh.tree_flatten, TetrahedraMesh.tree_unflatten
)


def _face_key_sort(cells: np.ndarray) -> np.ndarray:
    """All 4 faces of every cell as sorted vertex triples, shape [C*4, 3].

    Flat index convention: face ``c*4 + k`` is the face of cell ``c``
    opposite vertex ``k``.
    """
    # Face opposite vertex k keeps the other three vertices.
    opp = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]], dtype=np.int64)
    faces = cells[:, opp]  # [C, 4, 3]
    faces = np.sort(faces.reshape(-1, 3), axis=1)
    return faces


def build_adjacency(cells: np.ndarray) -> np.ndarray:
    """Face-adjacency table ``neighbors[C, 4]`` (−1 where no neighbor).

    Equivalent information to the reference's
    ``convert_tetrahedra_to_triangles`` triangle→(tet_a, tet_b) map
    (``src/tetrahedra_tracer.cpp:45-71``), derived by sorting face keys
    instead of hashing. Raises if a face is shared by more than two cells
    (mirrors the reference's error at ``tetrahedra_tracer.cpp:64-66``).
    """
    cells = np.asarray(cells, dtype=np.int64)
    if _native is not None and _native.available():
        return _native.build_adjacency(cells.astype(np.int32))
    num_cells = cells.shape[0]
    faces = _face_key_sort(cells)
    order = np.lexsort((faces[:, 2], faces[:, 1], faces[:, 0]))
    sf = faces[order]
    same = (sf[1:] == sf[:-1]).all(axis=1)
    if np.any(same[:-1] & same[1:]):
        raise ValueError("a triangle face is shared by more than 2 tetrahedra")
    neighbors = np.full(num_cells * 4, -1, dtype=np.int32)
    a = order[:-1][same]
    b = order[1:][same]
    neighbors[a] = b // 4
    neighbors[b] = a // 4
    return neighbors.reshape(num_cells, 4)


def compute_planes(vertices: np.ndarray, cells: np.ndarray) -> np.ndarray:
    """Barycentric plane tables ``f32[C, 4, 4]``.

    For cell ``c`` with vertex positions ``v_0..v_3``, solves for the
    affine functions ``b_k(x) = n_k·x + d_k`` with ``b_k(v_j) = δ_kj`` by
    inverting the homogeneous matrix ``M = [[v_0..v_3]; [1 1 1 1]]``.

    Near-singular (sliver) cells get well-defined but extreme planes —
    the marcher crosses them with ~zero chord (its exit distance is
    clamped monotonic). (Numerically) SINGULAR cells — zero-volume
    simplices Qhull emits for cospherical/coplanar inputs, which MUST
    stay in the complex to keep the neighbor adjacency watertight — are
    regularized by a deterministic relative jitter of their vertex
    positions (for the plane solve only): the resulting planes forward
    a crossing ray to a geometrically consistent neighbor with ~zero
    chord error instead of terminating it (the sentinel this replaces
    made the marcher stop mid-interior at every dropped sliver).
    """
    cells = np.asarray(cells, dtype=np.int64)
    v = np.asarray(vertices, dtype=np.float64)[cells]
    m = np.concatenate([v, np.ones_like(v[..., :1])], axis=-1)  # [C, 4, 4]
    m = np.swapaxes(m, -1, -2)  # columns are [v_k; 1]
    dets = np.linalg.det(m)
    # Relative degeneracy: |det| = 6*volume vs the cell's own edge scale.
    edge = np.linalg.norm(v[:, 1:] - v[:, :1], axis=-1).max(axis=-1)
    singular = np.abs(dets) <= 1e-14 * np.maximum(edge, 1e-30) ** 3
    if np.any(singular):
        # The jitter is PER-VERTEX (a deterministic hash of the global
        # vertex index), not per-cell: two adjacent singular cells then
        # regularize their shared face with the SAME jittered vertex
        # positions, so their face planes agree and a ray forwarded
        # A->B cannot be forwarded straight back B->A (the ping-pong a
        # per-cell-random jitter allows, which burned march steps and
        # surfaced as spurious overflow on cospherical inputs). The
        # jittered complex is a consistent global geometry, so
        # forwarding between singular cells is acyclic by construction.
        m = m.copy()
        all_idx = np.nonzero(singular)[0]
        idx = all_idx
        sc = float(np.abs(v).max()) or 1.0
        eps = 1e-7
        for _ in range(8):
            # Re-jitter EVERY singular cell at the current eps, not just
            # the still-singular subset: two adjacent singular cells
            # resolving in different rounds would otherwise see
            # different jittered positions for their SHARED vertices,
            # making their face planes disagree — the A->B->A ping-pong
            # the per-vertex hash exists to rule out.
            vid = cells[all_idx]  # [N, 4] global vertex ids
            jit = np.stack(
                [_hash_unit(vid, salt) for salt in range(3)], axis=-1
            )  # [N, 4, 3] in [-1, 1], a pure function of vertex id
            vj = v[all_idx] + eps * sc * jit
            mj = np.concatenate([vj, np.ones_like(vj[..., :1])], axis=-1)
            mj = np.swapaxes(mj, -1, -2)
            m[all_idx] = mj
            still_all = np.abs(np.linalg.det(mj)) <= (
                1e-14 * np.maximum(edge[all_idx], 1e-30) ** 3
            )
            idx = all_idx[still_all]
            if not len(idx):
                break
            eps *= 10.0
        else:  # pathological (e.g. 4 identical points): sentinel that
            # is never "inside" and never an exit (ray terminates there;
            # such a cell has no crossable interior anyway)
            m[idx] = np.eye(4)
            planes = np.linalg.inv(m)
            planes[idx] = np.array([0.0, 0.0, 0.0, -1e30])[None, :]
            return planes.astype(np.float32)
    planes = np.linalg.inv(m)
    return planes.astype(np.float32)


_TWO_HOP_OCC_UPDATE = None


def _two_hop_occ_update():
    """Jitted single-materialization write of every two-hop block's
    occupancy column (own col 24 + the 4 neighbor blocks' cols
    ``25k + 24`` carrying the NEIGHBORS' values) — the ONE place that
    knows the block layout; ``TetrahedraMesh.with_occupancy`` and the
    trainer's periodic column write both route through it."""
    global _TWO_HOP_OCC_UPDATE
    if _TWO_HOP_OCC_UPDATE is None:
        import jax
        import jax.numpy as jnp

        def update(t2, occ, neighbors):
            safe = jnp.maximum(neighbors, 0)
            vals = jnp.concatenate([occ[:, None], occ[safe]], axis=1)
            cols = jnp.array([24, 49, 74, 99, 124], jnp.int32)
            return t2.at[:, cols].set(vals)

        # No donation: ``with_occupancy`` returns a NEW mesh and the
        # caller's old mesh must stay valid.
        _TWO_HOP_OCC_UPDATE = jax.jit(update)
    return _TWO_HOP_OCC_UPDATE


def _hash_unit(idx: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic splitmix64-style hash of integer ids to uniform
    [-1, 1] floats — per-VERTEX jitter for degenerate-cell plane
    regularization (see :func:`compute_planes`). A pure function of
    ``(id, salt)`` so every cell touching a vertex sees the same
    jittered position."""
    x = np.asarray(idx, dtype=np.uint64) + np.uint64(salt + 1) * np.uint64(
        0x9E3779B97F4A7C15
    )
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53) * 2.0 - 1.0


def _check_watertight(vertices, cells, neighbors, hull_eqs, tol_rel=1e-5):
    """Raise if any boundary face (neighbor −1) lies strictly INSIDE the
    convex hull — a hole in the complex that would silently terminate
    marching rays. ``tol_rel`` is relative to the scene scale (hull
    plane normals are unit, so the eval is a signed distance)."""
    boundary_mask = (np.asarray(neighbors) < 0).reshape(-1)
    if not boundary_mask.any():
        return
    v = np.asarray(vertices, np.float64)
    faces = _face_key_sort(np.asarray(cells, np.int64))[boundary_mask]
    centroids = v[faces].mean(axis=1)  # [B, 3]
    scale = float(np.abs(v).max()) or 1.0
    # Signed distance to the hull: max over facet half-spaces (<= 0
    # inside; == 0 on the surface). Chunked — B x H can be large.
    tol = tol_rel * scale
    n, d = hull_eqs[:, :3], hull_eqs[:, 3]
    interior = 0
    example = None
    for i in range(0, len(centroids), 65536):
        c = centroids[i : i + 65536]
        dist = (c @ n.T + d[None, :]).max(axis=1)
        bad = dist < -tol
        interior += int(bad.sum())
        if example is None and bad.any():
            example = c[np.argmax(bad)]
    if interior:
        raise ValueError(
            f"non-watertight tetrahedra complex: {interior} boundary "
            f"face(s) lie strictly inside the convex hull (e.g. near "
            f"{example}); the marcher would silently terminate rays "
            "there. Most likely cause: degenerate (zero-volume) cells "
            "were dropped from the cell list before adjacency — pass "
            "the FULL simplicial complex (tetranerf_tpu keeps slivers "
            "and regularizes their plane tables instead)."
        )


def _convex_hull(vertices: np.ndarray):
    from scipy.spatial import ConvexHull

    hull = ConvexHull(np.asarray(vertices, dtype=np.float64), qhull_options="Qx")
    return hull


def build_mesh(
    vertices: np.ndarray,
    cells: Optional[np.ndarray] = None,
    *,
    neighbors: Optional[np.ndarray] = None,
    dtype=np.float32,
    two_hop_table: bool = False,
) -> TetrahedraMesh:
    """Build the full device mesh structure from vertices (+ optional cells).

    If ``cells`` is None, the point cloud is Delaunay-tetrahedralized first
    (matching ``TetrahedraNerf._load_points_from_metadata``,
    ``tetranerf/nerfstudio/model.py:302-316`` of the reference).

    ``two_hop_table`` additionally builds ``march_table2`` (512 B/cell —
    2x the march table) for the ``traversal_hops=2`` marcher; off by
    default (enable where the march dominates and the table fits HBM).
    """
    vertices = np.ascontiguousarray(vertices, dtype=np.float64)
    if cells is None:
        from .delaunay import triangulate

        cells = triangulate(vertices)
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    if neighbors is None:
        neighbors = build_adjacency(cells)
    planes = compute_planes(vertices, cells)

    # Convex hull half-spaces for the slab entry/exit test. Qhull returns
    # facet equations with outward unit normals: n·x + d <= 0 inside.
    hull = _convex_hull(vertices)
    hull_eqs = hull.equations.astype(np.float64)

    # Watertightness guard: every boundary face (neighbor −1) must lie ON
    # the convex hull. An interior boundary face — typically from a cell
    # list with degenerate simplices dropped before adjacency (e.g. an
    # externally filtered .th) — makes the marcher terminate rays
    # mid-interior SILENTLY: fail loudly instead (the reference's CGAL
    # complex is watertight by construction, ``triangulation.cpp:34-75``;
    # our own ``triangulate`` keeps the full complex too).
    _check_watertight(vertices, cells, neighbors, hull_eqs)

    # Map each hull facet to an incident boundary cell: hash boundary faces
    # of the complex by sorted vertex triple and look the facet up; facets
    # that merged/retriangulated differently fall back to a vertex-incident
    # cell (the traversal walk corrects the few-step discrepancy).
    vertex_cells = np.zeros(len(vertices), dtype=np.int32)
    c_idx = np.arange(len(cells), dtype=np.int32)
    for k in range(4):
        vertex_cells[cells[:, k]] = c_idx

    boundary_mask = (neighbors < 0).reshape(-1)
    boundary_faces = _face_key_sort(cells.astype(np.int64))[boundary_mask]
    boundary_cells = np.repeat(c_idx, 4)[boundary_mask]
    face_lut = {tuple(f): c for f, c in zip(boundary_faces, boundary_cells)}

    hull_simplices = np.sort(hull.simplices, axis=1)
    hull_cells = np.empty(len(hull_simplices), dtype=np.int32)
    for i, tri in enumerate(hull_simplices):
        c = face_lut.get(tuple(int(t) for t in tri))
        if c is None:
            c = vertex_cells[tri[0]]
        hull_cells[i] = c

    # Rows narrower than 64 floats hit XLA's slow per-column gather path
    # on TPU (measured: cost grows ~linearly with width below 64, then
    # drops 5x at >= 64). Pad the hot tables to the fast row widths.
    # Filled in place — no intermediate packed copy (host peak memory
    # matters at dense-1M scale: ~6M cells).
    march_table = np.zeros((len(cells), 64), np.float32)
    march_table[:, :16] = planes.astype(np.float32).reshape(len(cells), 16)
    march_table[:, 16:20] = neighbors.astype(np.int32).view(np.float32)
    march_table[:, 20:24] = cells.view(np.float32)
    # Two-hop row: self + the 4 neighbors' 25-float blocks (incl. the
    # occupancy column; boundary -> cell-0 block, gated by the marcher's
    # neighbor-id check). 128-float rows gather at the same row RATE as
    # 64-float rows, so the two-hop march halves its gather-chain row
    # count (the dominant march cost) for 2x the table memory.
    if two_hop_table:
        packed = march_table[:, :25]
        safe_nbr = np.where(neighbors >= 0, neighbors, 0)
        march_table2 = np.zeros((len(cells), 128), np.float32)
        march_table2[:, :125] = np.concatenate(
            [packed[:, None, :], packed[safe_nbr]], axis=1
        ).reshape(len(cells), 125)
    else:
        march_table2 = np.zeros((0, 128), np.float32)

    # HOST (numpy) arrays: a mesh can be hundreds of MB to GBs, and the
    # long-lived model.mesh reference must not pin the full tables in
    # device HBM — consumers place what they need once (the Trainer
    # device_puts the slim() tables; the tracer facade device_puts on
    # load); jit calls with a numpy mesh still work via implicit
    # transfer.
    return TetrahedraMesh(
        vertices=np.ascontiguousarray(vertices, dtype=dtype),
        cells=cells,
        neighbors=np.ascontiguousarray(neighbors, dtype=np.int32),
        planes=march_table[:, :16].reshape(len(cells), 4, 4),
        hull_eqs=np.ascontiguousarray(hull_eqs, dtype=dtype),
        hull_cells=hull_cells,
        vertex_cells=vertex_cells,
        march_table=march_table,
        march_table2=march_table2,
        skip_table=np.zeros((0, 0, 0, 8), np.float32),
        skip_meta=np.zeros(8, np.float32),
    )
