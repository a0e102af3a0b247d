"""Vertex-distance attention warp — the 'dynamic' model family's hot op.

Reference semantics (/root/reference/models/dynamic_pipeline.py:53-66):
  dist[r,s,v]   = || sample[r,s] - goal_vertex[r,v] ||
  att[r,s,v]    = relu(warp_radius - dist) * warp_temperature
  w[r,s,:]      = modified_softmax(att)        (GLOBAL max over the whole batch!
                                                utils.py:57-60 — zero activation
                                                maps to exactly zero weight)
  warp[r,s,:]   = sum_v w[r,s,v] * warp_vec[r,v]

The reference materializes the [batch, samples, V] tensor (and ran out of GPU
memory doing so — see the chunking comment at vertex_sphere_dataset.py:127-128).
Here the V axis is processed in fixed chunks with running (sum_exp, weighted-sum)
accumulators — the flash-attention trick adapted to the modified softmax: since
att >= 0 and the global max M >= 0 is computed in a cheap first pass (distance
only, no exp), the second pass accumulates exp(att - M) and exp(att - M) * warp
per chunk. Memory is O(R*S*chunk) instead of O(R*S*V).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dist_chunk(samples_flat: jnp.ndarray, verts_chunk: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] x [N, C, 3] -> [N, C] euclidean distances."""
    diff = samples_flat[:, None, :] - verts_chunk
    return jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-24))


@partial(jax.jit, static_argnames=("chunk_size",))
def relu_attention_warp(samples: jnp.ndarray, goal_vertices: jnp.ndarray,
                        warp_vectors: jnp.ndarray, warp_radius,
                        chunk_size: int = 512) -> jnp.ndarray:
    """Normalized-ReLU vertex attention (the image_wise solver's variant).

    Reference /root/reference/solver/image_wise_solver.py:89-101:
      att = relu(warp_radius - dist);  w = att / (sum_v att + 1e-5)
    samples [R, S, 3]; goal_vertices [V, 3]; warp_vectors [V, 3] (one mesh —
    image-wise processes one image at a time). Differentiable wrt the vertices
    (gradients flow back into the estimated pose through LBS). V is chunked
    with running (sum, weighted-sum) accumulators.
    """
    R, S, _ = samples.shape
    V = goal_vertices.shape[0]
    pad = (-V) % chunk_size
    gv = jnp.pad(goal_vertices, ((0, pad), (0, 0)), constant_values=1e6)
    wv = jnp.pad(warp_vectors, ((0, pad), (0, 0)))
    n_chunks = gv.shape[0] // chunk_size
    gv = gv.reshape(n_chunks, chunk_size, 3)
    wv = wv.reshape(n_chunks, chunk_size, 3)
    radius = jnp.float32(warp_radius) if not hasattr(warp_radius, "dtype") else warp_radius

    def body(carry, chunk):
        s_att, s_warp = carry
        verts, warps = chunk
        diff = samples[:, :, None, :] - verts[None, None, :, :]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-24))
        att = jax.nn.relu(radius - dist)                  # [R, S, C]
        s_att = s_att + jnp.sum(att, -1)
        s_warp = s_warp + jnp.einsum("rsc,cd->rsd", att, warps)
        return (s_att, s_warp), None

    init = (jnp.zeros((R, S), jnp.float32), jnp.zeros((R, S, 3), jnp.float32))
    (s_att, s_warp), _ = jax.lax.scan(body, init, (gv, wv))
    return s_warp / (s_att[..., None] + 1e-5)


@partial(jax.jit, static_argnames=("chunk_size",))
def vertex_attention_warp(samples: jnp.ndarray, goal_vertices: jnp.ndarray,
                          warp_vectors: jnp.ndarray, warp_radius: float,
                          warp_temperature: float,
                          chunk_size: int = 512) -> jnp.ndarray:
    """Per-sample warp by distance attention over the goal-mesh vertices.

    samples:       [R, S, 3] ray sample positions
    goal_vertices: [R, V, 3] per-ray goal mesh vertices (usually a gather of a
                   per-image vertex table — see pipelines.dynamic)
    warp_vectors:  [R, V, 3] canonical - goal per-vertex warps
    Returns warp [R, S, 3].
    """
    R, S, _ = samples.shape
    V = goal_vertices.shape[1]
    pad = (-V) % chunk_size
    gv = jnp.pad(goal_vertices, ((0, 0), (0, pad), (0, 0)), constant_values=1e6)
    wv = jnp.pad(warp_vectors, ((0, 0), (0, pad), (0, 0)))
    n_chunks = gv.shape[1] // chunk_size
    gv = gv.reshape(R, n_chunks, chunk_size, 3).transpose(1, 0, 2, 3)
    wv = wv.reshape(R, n_chunks, chunk_size, 3).transpose(1, 0, 2, 3)
    flat = samples.reshape(R, S, 3)

    temp = jnp.float32(warp_temperature)
    radius = jnp.float32(warp_radius)

    def att_chunk(verts_chunk):
        # [R, S, C]
        diff = flat[:, :, None, :] - verts_chunk[:, None, :, :]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-24))
        return jax.nn.relu(radius - dist) * temp

    # pass 1: global max (scalar, matches the reference's torch.max over the
    # full [R, S, V] activation tensor)
    def max_body(carry, chunk):
        att = att_chunk(chunk)
        return jnp.maximum(carry, jnp.max(att)), None

    m, _ = jax.lax.scan(max_body, jnp.float32(0.0), gv)
    # att >= 0 everywhere, so the global max over the padded tail (att == 0) is
    # harmless; m >= 0 always.

    # pass 2: accumulate sum(exp) and sum(exp * warp)
    def acc_body(carry, chunks):
        s_exp, s_warp = carry
        verts_chunk, warp_chunk = chunks
        e = jnp.exp(att_chunk(verts_chunk) - m)              # [R, S, C]
        s_exp = s_exp + jnp.sum(e, -1)
        s_warp = s_warp + jnp.einsum("rsc,rcd->rsd", e, warp_chunk)
        return (s_exp, s_warp), None

    init = (jnp.zeros((R, S), jnp.float32), jnp.zeros((R, S, 3), jnp.float32))
    (s_exp, s_warp), _ = jax.lax.scan(acc_body, init, (gv, wv))

    # modified_softmax: weights = (exp(att-m) - exp(-m)) / sum(exp(att-m));
    # the -exp(-m) correction applied to the weighted sum equals
    # exp(-m) * sum_v warp_v, and to the normalizer it is already in s_exp.
    # We reproduce it exactly:
    total_warp = jnp.sum(warp_vectors, 1)                    # [R, 3]
    corr = jnp.exp(-m)
    numer = s_warp - corr * total_warp[:, None, :]
    # normalizer of modified_softmax is sum_v exp(att-m) over REAL vertices:
    # the padded tail contributed `pad` spurious exp(0-m) terms — remove them.
    s_exp = s_exp - pad * corr
    # guard: when a sample is outside every vertex sphere AND m is large,
    # exp(-m) underflows and the reference's 0/0 would NaN (it only survives on
    # denormals); the limit of modified_softmax there is exactly 0 warp.
    return numer / jnp.maximum(s_exp[..., None], 1e-30)
