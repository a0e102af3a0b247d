"""Alpha-composite volume rendering (raw network outputs -> pixel colors).

Matches the reference's raw2outputs (/root/reference/utils.py:134-191) including
its parity-relevant quirks:
  * dists: z-diffs with 1e10 appended, scaled by ||direction|| per sample,
  * color = sigmoid(raw[..., :3]), density alpha = 1 - exp(-relu(sigma)*dist),
  * exclusive cumprod of (1 - alpha + 1e-10) for transmittance,
  * optional gaussian sigma noise (training regularizer, reference utils.py:172-175),
  * white-background compositing rgb += (1 - acc),
  * degenerate single-sample path returns sigmoid(rgb) directly
    (reference utils.py:170-171, used by the 'smpl' single-sample model).

The whole function is elementwise/scan-free jnp so XLA fuses it into the tail of
the MLP matmul chain — on TPU this is a pure-VPU epilogue, no HBM roundtrip.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray        # [R, 3]
    weights: jnp.ndarray    # [R, S]
    density: jnp.ndarray    # [R, S] (alpha per sample)
    depth: jnp.ndarray      # [R]
    acc: jnp.ndarray        # [R]


def raw2outputs(raw: jnp.ndarray, z_vals: jnp.ndarray, samples_directions: jnp.ndarray,
                sigma_noise_std: float = 0.0, white_background: bool = False,
                rng: Optional[jax.Array] = None) -> RenderOutputs:
    """Integrate raw MLP outputs [R, S, 4] along rays.

    samples_directions: [R, S, 3] or [R, 3] (broadcast) — only the norm is used.
    rng: PRNG key for sigma noise; noise is only added when rng is not None and
    sigma_noise_std > 0 (the reference gates only on sigma_noise_std and always
    draws; we additionally gate on rng so eval is deterministic).
    """
    rgb = jax.nn.sigmoid(raw[..., :3])
    if z_vals.shape[-1] == 1:
        r = rgb.reshape(raw.shape[0], 3)
        ones = jnp.ones((raw.shape[0], 1), raw.dtype)
        return RenderOutputs(r, ones, ones, z_vals[..., 0], ones[..., 0])

    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    if samples_directions.ndim == z_vals.ndim:  # [R, 3] per-ray direction
        norm = jnp.linalg.norm(samples_directions, axis=-1, keepdims=True)
        dists = dists * norm
    else:  # [R, S, 3] per-sample direction
        dists = dists * jnp.linalg.norm(samples_directions, axis=-1)

    sigma = raw[..., 3]
    if rng is not None and sigma_noise_std > 0.0:
        sigma = sigma + sigma_noise_std * jax.random.normal(rng, sigma.shape, sigma.dtype)
    density = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)

    one_minus = 1.0 - density + 1e-10
    exclusive = jnp.concatenate([jnp.ones_like(one_minus[..., :1]), one_minus[..., :-1]], -1)
    weights = density * jnp.cumprod(exclusive, -1)

    rgb_out = jnp.sum(weights[..., None] * rgb, -2)
    depth = jnp.sum(weights * z_vals, -1)
    acc = jnp.sum(weights, -1)
    if white_background:
        rgb_out = rgb_out + (1.0 - acc[..., None])
    return RenderOutputs(rgb_out, weights, density, depth, acc)


def compose_segments(rgb_a, trans_a, rgb_b, trans_b):
    """Associatively compose two front-to-back transmittance segments.

    A segment is (accumulated rgb, remaining transmittance T). Composition:
      rgb = rgb_a + T_a * rgb_b;  T = T_a * T_b.
    This associativity is what makes the sample axis shardable — the volumetric
    analog of blockwise/ring attention (SURVEY.md §2.9: sequence-parallelism).
    """
    return rgb_a + trans_a[..., None] * rgb_b, trans_a * trans_b


def raw2outputs_segmented(raw: jnp.ndarray, z_vals: jnp.ndarray,
                          samples_directions: jnp.ndarray, num_segments: int,
                          sigma_noise_std: float = 0.0,
                          white_background: bool = False,
                          rng: Optional[jax.Array] = None,
                          axis_name: Optional[str] = None) -> RenderOutputs:
    """Sample-axis-parallel volume integration.

    Splits the S sample axis into `num_segments` independent segments, computes
    each segment's (partial rgb, transmittance) locally, and composes them
    associatively — bit-identical to raw2outputs (same epsilons) but with a
    parallelizable reduction. With `axis_name` set, each caller under shard_map
    holds ONE segment and the composition runs as an exclusive-prefix
    transmittance product over the mesh axis; without it, segments are a local
    reshape (useful for rematerialized very deep sampling).

    Constraint: the dists scaling needs the NEXT segment's first z, so the last
    sample of each segment uses the same 1e10 sentinel as the global form only
    in the final segment; interior segments use the true next-z — computed here
    from the full z_vals, so local-mode results match raw2outputs exactly.
    """
    R, S = z_vals.shape
    assert S % num_segments == 0, "S must divide into segments"
    seg = S // num_segments

    # global dists (uses neighbors across segment boundaries)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], -1)
    if samples_directions.ndim == z_vals.ndim:
        dists = dists * jnp.linalg.norm(samples_directions, axis=-1, keepdims=True)
    else:
        dists = dists * jnp.linalg.norm(samples_directions, axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if rng is not None and sigma_noise_std > 0.0:
        sigma = sigma + sigma_noise_std * jax.random.normal(rng, sigma.shape, sigma.dtype)
    density = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    one_minus = 1.0 - density + 1e-10

    # per-segment local composite
    d_seg = density.reshape(R, num_segments, seg)
    om_seg = one_minus.reshape(R, num_segments, seg)
    rgb_seg = rgb.reshape(R, num_segments, seg, 3)
    z_seg = z_vals.reshape(R, num_segments, seg)

    exclusive = jnp.concatenate([jnp.ones_like(om_seg[..., :1]), om_seg[..., :-1]], -1)
    local_w = d_seg * jnp.cumprod(exclusive, -1)          # [R, P, seg]
    seg_rgb = jnp.sum(local_w[..., None] * rgb_seg, -2)   # [R, P, 3]
    seg_T = jnp.prod(om_seg, -1)                          # [R, P]
    seg_depth = jnp.sum(local_w * z_seg, -1)
    seg_acc = jnp.sum(local_w, -1)

    # exclusive prefix transmittance over segments, then weighted combine
    prefix_T = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(seg_T[..., :1]), seg_T[..., :-1]], -1), -1)
    rgb_out = jnp.sum(prefix_T[..., None] * seg_rgb, -2)
    depth = jnp.sum(prefix_T * seg_depth, -1)
    acc = jnp.sum(prefix_T * seg_acc, -1)
    weights = (local_w * prefix_T[..., None]).reshape(R, S)
    if white_background:
        rgb_out = rgb_out + (1.0 - acc[..., None])
    return RenderOutputs(rgb_out, weights, density, depth, acc)
