"""Sample-axis (sequence-parallel) volume rendering over a device mesh.

The reference's scalability axes were rays/batch and samples/ray, both bounded
by one GPU's memory (SURVEY.md §5). Rays shard trivially (parallel/mesh.py);
this module shards the SAMPLE axis: each device integrates its own depth
segment of every ray and the segments compose associatively
(core.integrate.compose_segments) — the volumetric analog of blockwise/ring
attention. Communication per ray is one all_gather of (3+1+1+1) floats per
device: rgb partial, transmittance, depth partial, acc partial — tiny, rides
ICI.

Use when samples-per-ray is very large (dense long-range volumes) or when a
ray's full sample set won't fit a chip alongside the MLP activations.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from smpl_nerf_tpu.core.integrate import RenderOutputs


def _segment_summary(raw, z_vals, dists, rng, sigma_noise_std):
    """Local (rgb, T, depth, acc) for this device's sample segment."""
    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if rng is not None and sigma_noise_std > 0.0:
        sigma = sigma + sigma_noise_std * jax.random.normal(rng, sigma.shape, sigma.dtype)
    density = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    one_minus = 1.0 - density + 1e-10
    exclusive = jnp.concatenate([jnp.ones_like(one_minus[..., :1]),
                                 one_minus[..., :-1]], -1)
    local_w = density * jnp.cumprod(exclusive, -1)
    seg_rgb = jnp.sum(local_w[..., None] * rgb, -2)
    seg_T = jnp.prod(one_minus, -1)
    seg_depth = jnp.sum(local_w * z_vals, -1)
    seg_acc = jnp.sum(local_w, -1)
    return seg_rgb, seg_T, seg_depth, seg_acc, local_w, density


def sample_parallel_raw2outputs(mesh: Mesh, raw: jnp.ndarray, z_vals: jnp.ndarray,
                                dists: jnp.ndarray,
                                sigma_noise_std: float = 0.0,
                                white_background: bool = False,
                                rng: Optional[jax.Array] = None,
                                axis: str = "model") -> RenderOutputs:
    """Volume-integrate with the SAMPLE axis sharded over mesh axis `axis`.

    raw [R, S, 4], z_vals/dists [R, S] with S divided across the axis. `dists`
    must be precomputed globally (needs cross-segment neighbor z) and include
    the per-sample |direction| scaling — see core.integrate.raw2outputs.
    """
    n = mesh.shape[axis]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(None, axis, None), P(None, axis), P(None, axis)),
             out_specs=(P(None), P(None, axis), P(None, axis), P(None), P(None)),
             check_vma=False)
    def run(raw_l, z_l, d_l):
        seg_rgb, seg_T, seg_depth, seg_acc, local_w, density = _segment_summary(
            raw_l, z_l, d_l, rng, sigma_noise_std)
        # gather every segment's tiny summary: [R, n] / [R, n, 3]
        all_rgb = jax.lax.all_gather(seg_rgb, axis, axis=1)      # [R, n, 3]
        all_T = jax.lax.all_gather(seg_T, axis, axis=1)          # [R, n]
        all_depth = jax.lax.all_gather(seg_depth, axis, axis=1)
        all_acc = jax.lax.all_gather(seg_acc, axis, axis=1)
        prefix = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(all_T[..., :1]), all_T[..., :-1]], -1), -1)
        rgb_out = jnp.sum(prefix[..., None] * all_rgb, -2)
        depth = jnp.sum(prefix * all_depth, -1)
        acc = jnp.sum(prefix * all_acc, -1)
        my_prefix = prefix[:, jax.lax.axis_index(axis)]
        weights_l = local_w * my_prefix[..., None]
        return rgb_out, weights_l, density, depth, acc

    rgb_out, weights, density, depth, acc = run(raw, z_vals, dists)
    if white_background:
        rgb_out = rgb_out + (1.0 - acc[..., None])
    return RenderOutputs(rgb_out, weights, density, depth, acc)


def global_dists(z_vals: jnp.ndarray, samples_directions: jnp.ndarray) -> jnp.ndarray:
    """The dists vector raw2outputs uses (1e10 sentinel + |direction| scaling)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    if samples_directions.ndim == z_vals.ndim:
        return dists * jnp.linalg.norm(samples_directions, axis=-1, keepdims=True)
    return dists * jnp.linalg.norm(samples_directions, axis=-1)
