"""Ground-truth per-sample warps by vertex-sphere assignment.

Reference semantics (/root/reference/datasets/vertex_sphere_dataset.py:122-160):
for each ray sample, find the nearest goal-mesh vertex; if it lies within
vertex_sphere_radius, the sample warps like that vertex (canonical - goal);
otherwise warp = 0. With warp_by_vertex_mean, the warp is instead the mean of
the warps of ALL vertices whose spheres contain the sample.

The reference looped over samples on the GPU because the [h*w, V] distance
matrix per sample already strained memory (see its comment at :127-128). Here
the vertex axis is chunked with running (min-dist, argmin) / (sum, count)
accumulators via lax.scan — memory O(rays*chunk), single fused program.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("radius", "by_mean", "chunk_size"))
def sample_warps_by_vertex_sphere(samples: jnp.ndarray, goal_vertices: jnp.ndarray,
                                  warp_vectors: jnp.ndarray, radius: float,
                                  by_mean: bool = False,
                                  chunk_size: int = 512) -> jnp.ndarray:
    """samples [R, S, 3], goal_vertices [V, 3], warp_vectors [V, 3] -> [R, S, 3]."""
    R, S, _ = samples.shape
    V = goal_vertices.shape[0]
    pad = (-V) % chunk_size
    gv = jnp.pad(goal_vertices, ((0, pad), (0, 0)), constant_values=1e6)
    wv = jnp.pad(warp_vectors, ((0, pad), (0, 0)))
    n_chunks = gv.shape[0] // chunk_size
    gv = gv.reshape(n_chunks, chunk_size, 3)
    wv = wv.reshape(n_chunks, chunk_size, 3)
    flat = samples.reshape(R * S, 3)

    if by_mean:
        def body(carry, chunk):
            s_warp, s_count = carry
            verts, warps = chunk
            d = jnp.linalg.norm(flat[:, None, :] - verts[None], axis=-1)  # [N, C]
            # reference uses strict < for inside (and leaves d == radius at its
            # raw value — effectively outside after the 0/1 rewrite)
            inside = (d < radius).astype(jnp.float32)
            s_warp = s_warp + inside @ warps
            s_count = s_count + jnp.sum(inside, -1)
            return (s_warp, s_count), None

        init = (jnp.zeros((R * S, 3), jnp.float32), jnp.zeros((R * S,), jnp.float32))
        (s_warp, s_count), _ = jax.lax.scan(body, init, (gv, wv))
        warp = s_warp / (s_count[:, None] + 1e-10)
    else:
        def body(carry, chunk):
            best_d, best_w = carry
            verts, warps = chunk
            d = jnp.linalg.norm(flat[:, None, :] - verts[None], axis=-1)  # [N, C]
            arg = jnp.argmin(d, -1)
            dmin = jnp.take_along_axis(d, arg[:, None], -1)[:, 0]
            wmin = warps[arg]
            better = dmin < best_d
            best_w = jnp.where(better[:, None], wmin, best_w)
            best_d = jnp.minimum(best_d, dmin)
            return (best_d, best_w), None

        init = (jnp.full((R * S,), jnp.inf, jnp.float32),
                jnp.zeros((R * S, 3), jnp.float32))
        (best_d, best_w), _ = jax.lax.scan(body, init, (gv, wv))
        warp = jnp.where((best_d < radius)[:, None], best_w, 0.0)
    return warp.reshape(R, S, 3)


@partial(jax.jit, static_argnames=("radius", "by_mean", "chunk_size"))
def sample_warps_by_vertex_sphere_rays(samples: jnp.ndarray,
                                       goal_vertices: jnp.ndarray,
                                       warp_vectors: jnp.ndarray, radius: float,
                                       by_mean: bool = False,
                                       chunk_size: int = 512) -> jnp.ndarray:
    """Per-RAY goal meshes: samples [R,S,3], goal_vertices [R,V,3],
    warp_vectors [R,V,3] -> [R,S,3].

    The in-step twin of sample_warps_by_vertex_sphere for batches whose rays
    come from different images (the --vertex_sphere_in_step training path —
    the precomputed per-ray-sample warp arrays are O(N_rays*S) HBM, ~23 GB at
    the reference's 256^2/230-image scale, so the warp is recomputed per step
    instead; same trade as the dynamic family's in-step LBS). Nearest-vertex
    selection is expressed as a one-hot matmul rather than argmin+gather (TPU
    gathers are slow; ties are resolved by the earlier chunk / averaged within
    a chunk, measure-zero for real meshes). Vertex axis chunked via lax.scan.
    """
    R, S, _ = samples.shape
    V = goal_vertices.shape[1]
    pad = (-V) % chunk_size
    gv = jnp.pad(goal_vertices, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
    wv = jnp.pad(warp_vectors, ((0, 0), (0, pad), (0, 0)))
    n_chunks = gv.shape[1] // chunk_size
    gv = gv.reshape(R, n_chunks, chunk_size, 3).transpose(1, 0, 2, 3)
    wv = wv.reshape(R, n_chunks, chunk_size, 3).transpose(1, 0, 2, 3)

    if by_mean:
        def body(carry, chunk):
            s_warp, s_count = carry
            verts, warps = chunk                                     # [R, C, 3]
            d = jnp.linalg.norm(samples[:, :, None, :] - verts[:, None, :, :],
                                axis=-1)                             # [R, S, C]
            inside = (d < radius).astype(jnp.float32)
            s_warp = s_warp + jnp.einsum("rsc,rcd->rsd", inside, warps)
            s_count = s_count + inside.sum(-1)
            return (s_warp, s_count), None

        init = (jnp.zeros((R, S, 3), jnp.float32), jnp.zeros((R, S), jnp.float32))
        (s_warp, s_count), _ = jax.lax.scan(body, init, (gv, wv))
        return s_warp / (s_count[..., None] + 1e-10)

    def body(carry, chunk):
        best_d, best_w = carry
        verts, warps = chunk
        d = jnp.linalg.norm(samples[:, :, None, :] - verts[:, None, :, :],
                            axis=-1)                                 # [R, S, C]
        dmin = d.min(-1)
        sel = (d == dmin[..., None]).astype(jnp.float32)
        sel = sel / sel.sum(-1, keepdims=True)
        wmin = jnp.einsum("rsc,rcd->rsd", sel, warps)
        better = dmin < best_d
        best_w = jnp.where(better[..., None], wmin, best_w)
        best_d = jnp.minimum(best_d, dmin)
        return (best_d, best_w), None

    init = (jnp.full((R, S), jnp.inf, jnp.float32),
            jnp.zeros((R, S, 3), jnp.float32))
    (best_d, best_w), _ = jax.lax.scan(body, init, (gv, wv))
    return jnp.where((best_d < radius)[..., None], best_w, 0.0)
