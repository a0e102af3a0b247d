"""Multi-resolution dense-grid NeRF (instant-NGP-style) — beyond-reference.

The reference's quality/speed is bounded by the 8x256 frequency-encoded MLP
(models/render_ray_net.py:6-79): every scene detail must be carved into dense
weights by thousands of Adam steps. Muller et al. 2022 (PAPERS.md, Instant
Neural Graphics Primitives) showed that moving capacity into trainable
interpolated feature GRIDS + a tiny MLP cuts convergence from hours to
minutes. TPU adaptation: instead of the paper's hash tables (random HBM
gathers — hostile to the TPU memory system), DENSE multi-resolution grids
(8/16/32/64)^3 x F: ~1.1M params total, each level small enough that XLA keeps
the gather footprint cache-friendly, and trilinear interpolation is 8 gathers
+ fused FMAs on the VPU. The head MLP is 3x64 — 30x fewer FLOPs/sample than
the reference trunk.

Opt-in: --grid_encoding=1 (nerf / append / smpl_nerf families). Positions are
normalized by a static axis-aligned bound (--grid_bound); the direction branch
keeps the reference's sin/cos encoding so view-dependence matches.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def trilinear_interpolate(grid: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """grid [R,R,R,F], p [N,3] in [0,1] -> [N,F] trilinear interpolation."""
    res = grid.shape[0]
    x = jnp.clip(p, 0.0, 1.0) * (res - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, res - 1)
    f = x - x0
    fx, fy, fz = f[:, 0:1], f[:, 1:2], f[:, 2:3]

    def g(ix, iy, iz):
        return grid[ix, iy, iz]

    c000 = g(x0[:, 0], x0[:, 1], x0[:, 2])
    c001 = g(x0[:, 0], x0[:, 1], x1[:, 2])
    c010 = g(x0[:, 0], x1[:, 1], x0[:, 2])
    c011 = g(x0[:, 0], x1[:, 1], x1[:, 2])
    c100 = g(x1[:, 0], x0[:, 1], x0[:, 2])
    c101 = g(x1[:, 0], x0[:, 1], x1[:, 2])
    c110 = g(x1[:, 0], x1[:, 1], x0[:, 2])
    c111 = g(x1[:, 0], x1[:, 1], x1[:, 2])
    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


class GridNerf(nn.Module):
    """Dense multi-res grid encoder + tiny MLP head; RenderRayNet-compatible
    output contract ([rgb, sigma] raw, activations in raw2outputs).

    Consumes RAW rows [prefix || xyz(3) || unit dir(3)] (takes_raw=True — the
    net runner skips host-side positional encoding).
    """
    levels: Sequence[int] = (8, 16, 32, 64)
    features: int = 4
    width: int = 64
    n_layers: int = 3
    dir_freqs: int = 4
    additional_input_dim: int = 0
    bound: float = 1.6
    dtype: jnp.dtype = jnp.float32

    takes_raw: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        add = self.additional_input_dim
        prefix = x[..., :add]
        pos = x[..., add:add + 3]
        dirs = x[..., add + 3:add + 6]
        p01 = (pos / self.bound + 1.0) * 0.5  # [-bound, bound] -> [0, 1]

        feats = []
        for res in self.levels:
            grid = self.param(
                f"grid_{res}",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                      -1e-4, 1e-4),
                (res, res, res, self.features))
            feats.append(trilinear_interpolate(grid, p01))
        h = jnp.concatenate(feats + ([prefix] if add else []), -1).astype(self.dtype)

        for i in range(self.n_layers - 1):
            h = nn.relu(nn.Dense(self.width, name=f"trunk_{i}", dtype=self.dtype)(h))
        h = nn.Dense(self.width, name="trunk_out", dtype=self.dtype)(h)
        sigma = nn.Dense(1, name="sigma_out_layer", dtype=self.dtype)(h)

        # view dependence: reference-style sin/cos direction encoding
        freqs = jnp.asarray(2.0 ** np.arange(self.dir_freqs), jnp.float32)
        s = dirs[..., None, :] * freqs[:, None]
        de = jnp.stack([jnp.sin(s), jnp.cos(s)], -2).reshape(*dirs.shape[:-1], -1)
        h = jnp.concatenate([h, de.astype(self.dtype)], -1)
        h = nn.relu(nn.Dense(self.width // 2, name="dir_0", dtype=self.dtype)(h))
        rgb = nn.Dense(3, name="rgb_out_layer", dtype=self.dtype)(h)
        return jnp.concatenate([rgb, sigma], -1).astype(jnp.float32)
