"""Synthetic multi-view scene for tests and benchmarks.

A textured unit sphere: point cloud sampled on/inside the sphere, camera
rays from a shell looking inward, and an analytic ground-truth image
function (surface albedo at the first ray-sphere hit, white background).
The target is view-consistent, so the model can actually fit it — a
self-contained stand-in for a Blender scene when no dataset is mounted.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _albedo(p: np.ndarray) -> np.ndarray:
    """Smooth position-dependent surface color in [0, 1]."""
    return 0.5 + 0.5 * np.stack(
        [
            np.sin(3.0 * p[..., 0]) * np.cos(2.0 * p[..., 1]),
            np.sin(4.0 * p[..., 1] + 1.0),
            np.cos(3.0 * p[..., 2] + 2.0) * np.sin(2.0 * p[..., 0]),
        ],
        axis=-1,
    )


def make_sphere_scene(
    num_points: int = 2000, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Point cloud (surface-heavy, some interior) + uint8 RGBA colors."""
    rng = np.random.default_rng(seed)
    n_surf = int(num_points * 0.8)
    d = rng.normal(size=(n_surf, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    surf = d * (1.0 + rng.normal(scale=0.01, size=(n_surf, 1)))
    inner = rng.normal(scale=0.45, size=(num_points - n_surf, 3))
    points = np.concatenate([surf, inner], axis=0)
    colors = np.clip(_albedo(points) * 255.0, 0, 255).astype(np.uint8)
    colors = np.concatenate(
        [colors, np.full((len(points), 1), 255, np.uint8)], axis=1
    )
    return points.astype(np.float64), colors


def sample_sphere_rays(
    rng: np.random.Generator, num_rays: int, radius: float = 2.5
) -> Tuple[np.ndarray, np.ndarray]:
    """Rays from a shell of radius ``radius`` aimed at the ball interior."""
    o = rng.normal(size=(num_rays, 3))
    o *= radius / np.linalg.norm(o, axis=1, keepdims=True)
    target = rng.uniform(-0.7, 0.7, size=(num_rays, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


# Camera-like scene: small objects + a sparse far background shell — the
# reference's standard COLMAP operating point (object points dense, a few
# hundred far scene/background points stretch the convex hull, cameras
# INSIDE the hull, most of each chord crossing empty space). This is the
# regime where empty-space skipping / occupancy termination must pay,
# unlike the sphere scene whose cloud fills its own hull.
_CAM_SPHERES = (  # (center, radius)
    (np.array([0.6, 0.0, 0.0]), 0.35),
    (np.array([-0.5, 0.45, 0.1]), 0.30),
    (np.array([0.0, -0.5, 0.35]), 0.25),
)
_CAM_BG_RADIUS = 5.0


def make_camera_scene(
    num_points: int = 2000, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Object-surface-heavy cloud + ~5% sparse background points on a far
    shell (hull-stretchers, like COLMAP's far scene points)."""
    rng = np.random.default_rng(seed)
    n_bg = max(64, int(num_points * 0.05))
    n_obj = num_points - n_bg
    pts = []
    total_r = sum(r for _, r in _CAM_SPHERES)
    for c, r in _CAM_SPHERES:
        n = int(n_obj * r / total_r)
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pts.append(c[None] + d * r * (1.0 + rng.normal(scale=0.01, size=(n, 1))))
    bg = rng.normal(size=(n_bg, 3))
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    bg *= _CAM_BG_RADIUS * (1.0 + rng.uniform(-0.1, 0.1, size=(n_bg, 1)))
    pts.append(bg)
    points = np.concatenate(pts, axis=0)
    colors = np.clip(_albedo(points) * 255.0, 0, 255).astype(np.uint8)
    colors = np.concatenate(
        [colors, np.full((len(points), 1), 255, np.uint8)], axis=1
    )
    return points.astype(np.float64), colors


def sample_camera_rays(
    rng: np.random.Generator, num_rays: int, radius: float = 2.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Rays from a camera shell INSIDE the hull aimed at the objects."""
    o = rng.normal(size=(num_rays, 3))
    o *= radius / np.linalg.norm(o, axis=1, keepdims=True)
    k = rng.integers(len(_CAM_SPHERES), size=num_rays)
    centers = np.stack([c for c, _ in _CAM_SPHERES])[k]
    jitter = rng.uniform(-0.5, 0.5, size=(num_rays, 3))
    d = centers + jitter - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(np.float32), d.astype(np.float32)


def camera_ray_targets(origins: np.ndarray, directions: np.ndarray) -> np.ndarray:
    """Analytic ground truth: albedo at the nearest object-sphere hit,
    else white background."""
    o, d = origins.astype(np.float64), directions.astype(np.float64)
    best_t = np.full(len(o), np.inf)
    rgb = np.ones((len(o), 3), np.float32)
    for c, r in _CAM_SPHERES:
        oc = o - c[None]
        b = np.sum(oc * d, axis=1)
        cc = np.sum(oc * oc, axis=1) - r * r
        disc = b * b - cc
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit &= (t > 0) & (t < best_t)
        p = o + t[:, None] * d
        rgb[hit] = _albedo(p[hit]).astype(np.float32)
        best_t = np.where(hit, t, best_t)
    return rgb


def sphere_ray_targets(origins: np.ndarray, directions: np.ndarray) -> np.ndarray:
    """Analytic ground truth: albedo at the first unit-sphere hit, else white."""
    o, d = origins.astype(np.float64), directions.astype(np.float64)
    b = np.sum(o * d, axis=1)
    c = np.sum(o * o, axis=1) - 1.0
    disc = b * b - c
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0
    p = o + t[:, None] * d
    rgb = np.ones((len(o), 3), np.float32)
    rgb[hit] = _albedo(p[hit]).astype(np.float32)
    return rgb
