"""Fused Pallas TPU kernel for hierarchical inverse-CDF sampling.

This is the TPU-native replacement for the reference's one native component,
the torchsearchsorted C++/CUDA extension (torchsearchsorted/src/cuda/
searchsorted_cuda_kernel.cu, called from utils.py:212 inside sample_pdf).
The CUDA kernel only did the binary search; everything around it (normalize,
cumsum, gather, lerp) was separate torch ops — 6 kernel launches and 5 HBM
round-trips per step. Here the WHOLE sample_pdf computation is one Pallas
kernel over a ray tile held in VMEM:

    weights + 1e-5 -> pdf -> cumsum -> cdf -> invert via branchless
    comparison-count -> bin gather via select-scan -> lerp

Instead of a binary search (data-dependent control flow — poison for the VPU),
the CDF inversion counts `u >= cdf[k]` over the K bins with a fori_loop of
[TILE, F] vector adds: K <= ~193 here, so the O(K*F) branchless form is both
simpler and faster than O(F log K) with serialized lane access. The bin gather
is a second K-scan of vector selects — dynamic per-lane gathers don't map to
the TPU's (8,128) tiles, selects do.

Semantics are bit-compatible with core.sampling.sample_pdf (the jnp oracle),
including the reference quirks: deterministic u = linspace(0,1,F)
(utils.py:206), +1e-5 weight floor, denom<1e-5 -> 1 guard.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 256


def _kernel(bins_ref, weights_ref, out_ref, *, n_fine: int):
    bins = bins_ref[:]                       # [T, K]
    weights = weights_ref[:] + 1e-5          # [T, K-1]
    T, K = bins.shape

    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    # cumsum as an upper-triangular-ones matmul (no cumsum lowering in Mosaic;
    # the MXU does a [T, K-1] x [K-1, K-1] dot in one pass anyway)
    row = jax.lax.broadcasted_iota(jnp.int32, (K - 1, K - 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K - 1, K - 1), 1)
    tri = (row <= col).astype(jnp.float32)
    cdf_tail = jnp.dot(pdf, tri, preferred_element_type=jnp.float32)  # [T, K-1]
    cdf = jnp.concatenate([jnp.zeros((T, 1), cdf_tail.dtype), cdf_tail], -1)  # [T, K]

    # u = linspace(0, 1, F) broadcast over the tile (iota must be integer)
    q = jax.lax.broadcasted_iota(jnp.int32, (T, n_fine), 1)
    u = q.astype(jnp.float32) * (1.0 / (n_fine - 1))

    # pass 1: inds[r, f] = #{k : u[r, f] >= cdf[r, k]}  (searchsorted right).
    # K is small and static -> unroll with STATIC column slices (Mosaic has no
    # dynamic_slice on values inside fori_loop).
    inds = jnp.zeros((T, n_fine), jnp.int32)
    for k in range(K):
        inds = inds + (u >= cdf[:, k:k + 1]).astype(jnp.int32)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, K - 1)

    # pass 2: gather cdf/bins at below/above by select-scan over k
    zeros = jnp.zeros((T, n_fine), jnp.float32)
    cdf_g0, cdf_g1, bins_g0, bins_g1 = zeros, zeros, zeros, zeros
    for k in range(K):
        ck = cdf[:, k:k + 1]
        bk = bins[:, k:k + 1]
        is_b = below == k
        is_a = above == k
        cdf_g0 = jnp.where(is_b, ck, cdf_g0)
        cdf_g1 = jnp.where(is_a, ck, cdf_g1)
        bins_g0 = jnp.where(is_b, bk, bins_g0)
        bins_g1 = jnp.where(is_a, bk, bins_g1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    out_ref[:] = bins_g0 + t * (bins_g1 - bins_g0)


@functools.partial(jax.jit, static_argnames=("n_fine", "interpret"))
def sample_pdf_fused(bins: jnp.ndarray, weights: jnp.ndarray, n_fine: int,
                     interpret: bool | None = None) -> jnp.ndarray:
    """bins [R, K], weights [R, K-1] -> fine samples [R, n_fine].

    Falls back to interpret mode automatically off-TPU (tests run it on CPU
    against the jnp oracle — the pattern the reference used for its extension,
    torchsearchsorted/test/test_searchsorted.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    R, K = bins.shape
    pad_r = (-R) % _TILE_R
    bins_p = jnp.pad(bins, ((0, pad_r), (0, 0)), constant_values=1.0)
    # pad weights uniformly so padded rows produce a valid (unused) cdf
    weights_p = jnp.pad(weights, ((0, pad_r), (0, 0)), constant_values=1.0)
    Rp = R + pad_r
    grid = (Rp // _TILE_R,)
    out = pl.pallas_call(
        functools.partial(_kernel, n_fine=n_fine),
        out_shape=jax.ShapeDtypeStruct((Rp, n_fine), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_R, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_R, K - 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_R, n_fine), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bins_p.astype(jnp.float32), weights_p.astype(jnp.float32))
    return out[:R]
