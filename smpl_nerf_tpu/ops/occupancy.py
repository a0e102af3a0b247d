"""Occupancy grid over the scene volume — ray culling without MLP evaluation.

Beyond-reference render accelerator (the reference renders every ray through
both MLPs, /root/reference/inference.py:247-254; our round-1 fast renderer
still ran the coarse MLP on EVERY ray just to compute cull scores). Here the
density field is baked once into a dense G^3 voxel grid (G^3 MLP evals, ~1/4
of one 128x128 coarse pass), dilated one voxel for conservatism, and each
ray's cull score becomes a handful of trilinear gathers on the VPU instead of
64 samples through an 8x256 MLP chain.

TPU-native design notes:
  * the grid is DENSE (jnp array, static shape) — hash/sparse structures from
    GPU NeRF codebases trade gather locality for memory; at G=64..128 a dense
    f32 grid is 1-8 MB, irrelevant next to HBM, and trilinear lookup is 8
    static gathers + lerps that XLA vectorizes cleanly.
  * building the grid is one batched density evaluation over the lattice —
    an MXU-shaped [G^2, G] megabatch, jitted with the renderer.
  * everything is shape-static: cull keeps a fixed top-K ray set, so the same
    compiled program serves every frame.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Aabb = Tuple[Tuple[float, float, float], Tuple[float, float, float]]

# covers the subject region of the reference scenes: cameras orbit at radius
# ~2.4 looking at a human centered near the origin (data/generate.py paths)
DEFAULT_AABB: Aabb = ((-2.0, -2.0, -2.0), (2.0, 2.0, 2.0))

# a ray whose max grid density exceeds this counts as foreground — used for
# cull-budget sizing and saturation detection (white-background-trained models
# carry ~zero density in empty space, so any clearly-positive value works)
OCC_THRESHOLD = 1e-2


def voxel_size(aabb: Aabb, resolution: int) -> float:
    """Smallest per-axis voxel edge length of the grid over `aabb`."""
    lo = np.asarray(aabb[0], np.float64)
    hi = np.asarray(aabb[1], np.float64)
    return float(np.min((hi - lo) / resolution))


def required_probes(aabb: Aabb, resolution: int, near: float, far: float) -> int:
    """Smallest probe count whose spacing <= the voxel size.

    ray_scores stays conservative only while consecutive probes cannot step
    over a (dilated) occupied voxel; deriving the count from the actual
    near/far span and grid geometry removes the silent dependence on the
    defaults (near/far = 1/4, G = 64) flagged in round 2.
    """
    return max(2, int(np.ceil((far - near) / voxel_size(aabb, resolution))) + 1)


def lattice(aabb: Aabb, resolution: int) -> jnp.ndarray:
    """Voxel-center coordinates [G, G, G, 3] for the grid over `aabb`."""
    lo = jnp.asarray(aabb[0], jnp.float32)
    hi = jnp.asarray(aabb[1], jnp.float32)
    centers = [(jnp.arange(resolution) + 0.5) / resolution * (hi[i] - lo[i]) + lo[i]
               for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*centers, indexing="ij")
    return jnp.stack([gx, gy, gz], -1)


def build_density_grid(density_fn: Callable[[jnp.ndarray], jnp.ndarray],
                       aabb: Aabb, resolution: int,
                       dilate_voxels: int = 2) -> jnp.ndarray:
    """Bake `density_fn(points [N,3]) -> sigma [N]` into a [G,G,G] grid.

    The grid is max-dilated `dilate_voxels` times so trilinear probes next to
    an occupied voxel cannot read zero (conservative culling).
    """
    pts = lattice(aabb, resolution).reshape(-1, 3)
    grid = density_fn(pts).reshape(resolution, resolution, resolution)
    grid = jnp.maximum(grid, 0.0)
    for _ in range(dilate_voxels):
        grid = _dilate_max(grid)
    return grid


def _dilate_max(grid: jnp.ndarray) -> jnp.ndarray:
    """3x3x3 max-pool with edge padding (stride 1), separable per axis."""
    for axis in range(3):
        n = grid.shape[axis]
        pad = [(1, 1) if a == axis else (0, 0) for a in range(3)]
        p = jnp.pad(grid, pad, mode="edge")
        grid = jnp.maximum(
            jax.lax.slice_in_dim(p, 0, n, axis=axis),
            jnp.maximum(jax.lax.slice_in_dim(p, 1, n + 1, axis=axis),
                        jax.lax.slice_in_dim(p, 2, n + 2, axis=axis)))
    return grid


def trilinear(grid: jnp.ndarray, aabb: Aabb, points: jnp.ndarray) -> jnp.ndarray:
    """Trilinear grid lookup at `points` [..., 3]; zero outside the aabb."""
    G = grid.shape[0]
    lo = jnp.asarray(aabb[0], jnp.float32)
    hi = jnp.asarray(aabb[1], jnp.float32)
    inside = jnp.all((points >= lo) & (points <= hi), -1)
    # continuous voxel coords: voxel centers sit at u = i + 0.5
    u = (points - lo) / (hi - lo) * G - 0.5
    u = jnp.clip(u, 0.0, G - 1.0)
    i0 = jnp.floor(u).astype(jnp.int32)
    i0 = jnp.minimum(i0, G - 2)
    f = u - i0
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    def g(dx, dy, dz):
        return grid[x0 + dx, y0 + dy, z0 + dz]

    c00 = g(0, 0, 0) * (1 - fx) + g(1, 0, 0) * fx
    c10 = g(0, 1, 0) * (1 - fx) + g(1, 1, 0) * fx
    c01 = g(0, 0, 1) * (1 - fx) + g(1, 0, 1) * fx
    c11 = g(0, 1, 1) * (1 - fx) + g(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    val = c0 * (1 - fz) + c1 * fz
    return jnp.where(inside, val, 0.0)


def nearest(grid: jnp.ndarray, aabb: Aabb, points: jnp.ndarray) -> jnp.ndarray:
    """Nearest-voxel grid lookup at `points` [..., 3]; zero outside the aabb.

    TPU-friendly: ONE flat gather instead of trilinear's eight — general
    gathers are the slowest primitive on TPU and dominate the probe cost.
    Combined with >=2 dilation voxels this stays conservative (a point within
    half a voxel of occupancy reads a dilated-occupied cell).
    """
    G = grid.shape[0]
    lo = jnp.asarray(aabb[0], jnp.float32)
    hi = jnp.asarray(aabb[1], jnp.float32)
    inside = jnp.all((points >= lo) & (points <= hi), -1)
    u = (points - lo) / (hi - lo) * G
    i = jnp.clip(u.astype(jnp.int32), 0, G - 1)
    flat = (i[..., 0] * G + i[..., 1]) * G + i[..., 2]
    val = jnp.take(grid.reshape(-1), flat)
    return jnp.where(inside, val, 0.0)


def ray_scores(grid: jnp.ndarray, aabb: Aabb, origins: jnp.ndarray,
               dirs: jnp.ndarray, near: float, far: float,
               n_probe: Optional[int] = None,
               method: str = "nearest") -> jnp.ndarray:
    """Max grid occupancy along each ray [R] via `n_probe` grid probes.

    Probe spacing (far-near)/(n_probe-1) must not exceed the (dilated) voxel
    size for conservative coverage — otherwise a ray can step over an occupied
    voxel unseen and genuine foreground gets culled to flat background.
    n_probe=None (default) derives the smallest safe count from the actual
    span and grid geometry (required_probes); an explicit n_probe that
    violates the bound raises instead of silently under-sampling.
    method='nearest' (default) costs one TPU gather per probe; 'trilinear'
    costs eight and is only worth it for very coarse grids.
    """
    if n_probe is None:
        n_probe = required_probes(aabb, grid.shape[0], near, far)
    else:
        spacing = (far - near) / max(n_probe - 1, 1)
        vox = voxel_size(aabb, grid.shape[0])
        if spacing > vox * (1 + 1e-6):
            raise ValueError(
                f"ray_scores: probe spacing {spacing:.4g} exceeds voxel size "
                f"{vox:.4g} (near={near}, far={far}, n_probe={n_probe}, "
                f"G={grid.shape[0]}) — culling would not be conservative; "
                f"use n_probe>={required_probes(aabb, grid.shape[0], near, far)} "
                f"or n_probe=None to derive it")
    t = jnp.linspace(near, far, n_probe, dtype=jnp.float32)
    pts = origins[:, None, :] + dirs[:, None, :] * t[None, :, None]
    lookup = nearest if method == "nearest" else trilinear
    return lookup(grid, aabb, pts).max(-1)
