"""Batched ray-mesh intersection (Möller–Trumbore) in pure jnp.

Replaces trimesh's RayMeshIntersector, which the reference uses in four places:
ground-truth warp computation (render.py:260-261), vertex-sphere z-val priors
(datasets/vertex_sphere_dataset.py:83-117), image-wise per-epoch z-vals against
the currently-estimated pose (datasets/image_wise_dataset.py:106-138), and ray
dependency analysis (utils.py:312-378).

TPU-native design: the SMPL-sized meshes here (~10-14k faces) are small enough
to brute-force: R x F intersection tests are one big fused elementwise pipeline
on the VPU, chunked over rays to bound memory. No BVH — data-dependent tree
walks are exactly what the TPU hates; the dense formulation is faster up to
~100k faces and is differentiable and jittable. Used both on host (dataset
generation, CPU backend) and inside jitted steps (image_wise z-vals).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-9


class RayHits(NamedTuple):
    t: jnp.ndarray          # [R] distance to closest hit (inf if none)
    face_idx: jnp.ndarray   # [R] index of closest hit face (-1 if none)
    bary: jnp.ndarray       # [R, 3] barycentric coords (w0, w1, w2) of the hit
    hit: jnp.ndarray        # [R] bool


def _intersect_chunk(origins: jnp.ndarray, dirs: jnp.ndarray,
                     v0: jnp.ndarray, e1: jnp.ndarray, e2: jnp.ndarray):
    """Möller–Trumbore for a chunk of rays against all faces.

    origins/dirs: [C, 3]; v0/e1/e2: [F, 3]. Returns per-ray closest positive t,
    face index, and barycentrics.
    """
    # pvec = dir x e2 : [C, F, 3]
    pvec = jnp.cross(dirs[:, None, :], e2[None, :, :])
    det = jnp.sum(e1[None] * pvec, -1)                       # [C, F]
    inv_det = jnp.where(jnp.abs(det) > _EPS, 1.0 / det, 0.0)
    tvec = origins[:, None, :] - v0[None]                    # [C, F, 3]
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(dirs[:, None, :] * qvec, -1) * inv_det
    t = jnp.sum(e2[None] * qvec, -1) * inv_det
    valid = ((jnp.abs(det) > _EPS) & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > 1e-6))
    t = jnp.where(valid, t, jnp.inf)
    best = jnp.argmin(t, -1)                                 # [C]
    t_best = jnp.take_along_axis(t, best[:, None], -1)[:, 0]
    u_best = jnp.take_along_axis(u, best[:, None], -1)[:, 0]
    v_best = jnp.take_along_axis(v, best[:, None], -1)[:, 0]
    hit = jnp.isfinite(t_best)
    face_idx = jnp.where(hit, best, -1)
    bary = jnp.stack([1.0 - u_best - v_best, u_best, v_best], -1)
    return t_best, face_idx, bary, hit


@partial(jax.jit, static_argnames=("chunk_size",))
def intersect_rays(origins: jnp.ndarray, dirs: jnp.ndarray,
                   vertices: jnp.ndarray, faces: jnp.ndarray,
                   chunk_size: int = 1024) -> RayHits:
    """Closest-hit intersection of R rays against a triangle mesh.

    origins/dirs [R, 3]; vertices [V, 3]; faces [F, 3] int. Rays are processed
    in `chunk_size` chunks via lax.map so the [C, F] work tensor stays bounded.
    """
    tri = vertices[faces]          # [F, 3, 3]
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    R = origins.shape[0]
    pad = (-R) % chunk_size
    o = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)], 0)
    d = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)], 0)
    o = o.reshape(-1, chunk_size, 3)
    d = d.reshape(-1, chunk_size, 3)

    def body(args):
        oo, dd = args
        return _intersect_chunk(oo, dd, v0, e1, e2)

    t, face_idx, bary, hit = jax.lax.map(body, (o, d))
    flat = lambda x: x.reshape((-1,) + x.shape[2:])[:R]
    return RayHits(flat(t), flat(face_idx), flat(bary), flat(hit))


def intersect_rays_multi(origins: jnp.ndarray, dirs: jnp.ndarray,
                         vertices: jnp.ndarray, faces: jnp.ndarray,
                         max_hits: int = 4, chunk_size: int = 1024):
    """Up to `max_hits` intersections per ray, nearest first.

    Iterated closest-hit with the origin advanced past each hit (static
    unroll, shapes fixed). Returns (t [R, max_hits] with inf padding,
    hit [R, max_hits] bool). t values are distances along the ORIGINAL ray.
    Used for the vertex-sphere GMM z-prior, which places gaussians at every
    body entry/exit point (reference vertex_sphere_dataset.py:108-115).
    """
    R = origins.shape[0]
    dirs_unit = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ts = []
    hit_flags = []
    offset = jnp.zeros((R,), origins.dtype)
    cur_origins = origins
    for _ in range(max_hits):
        hits = intersect_rays(cur_origins, dirs_unit, vertices, faces,
                              chunk_size=min(chunk_size, R))
        t_global = jnp.where(hits.hit, offset + hits.t, jnp.inf)
        ts.append(t_global)
        hit_flags.append(hits.hit)
        # advance just past the hit for the next round
        step = jnp.where(hits.hit, hits.t + 1e-4, 0.0)
        cur_origins = cur_origins + dirs_unit * step[:, None]
        offset = offset + step
    return jnp.stack(ts, -1), jnp.stack(hit_flags, -1)


def dependent_pixels(origins: jnp.ndarray, dirs: jnp.ndarray,
                     canonical_vertices: jnp.ndarray, goal_vertices: jnp.ndarray,
                     faces: jnp.ndarray, camera_transform: jnp.ndarray,
                     h: int, w: int, focal: float):
    """For each ray: the pixel its canonical-mesh hit maps to under the goal pose.

    Working version of the reference's get_dependent_rays_indices
    (utils.py:312-378, which projected canonical hits through the goal mesh
    with cv2.projectPoints — dead code there because of undefined locals).
    Returns (pixel_xy [R, 2] int32, hit [R] bool); pixels are (-1, -1) where
    the ray misses the canonical mesh or leaves the frame.
    """
    hits = intersect_rays(origins, dirs, canonical_vertices, faces,
                          chunk_size=min(1024, origins.shape[0]))
    goal_pts = barycentric_transfer(hits, faces, goal_vertices)   # [R, 3]
    cam = jnp.asarray(camera_transform, jnp.float32)
    R_m, t = cam[:3, :3], cam[:3, 3]
    vc = (goal_pts - t) @ R_m                                     # world->camera
    x = -vc[:, 0] / vc[:, 2] * focal + w * 0.5
    y = vc[:, 1] / vc[:, 2] * focal + h * 0.5
    px = jnp.stack([jnp.round(x), jnp.round(y)], -1).astype(jnp.int32)
    in_frame = ((px[:, 0] >= 0) & (px[:, 0] < w) & (px[:, 1] >= 0) & (px[:, 1] < h)
                & hits.hit)
    px = jnp.where(in_frame[:, None], px, -1)
    return px, in_frame


def barycentric_transfer(hits: RayHits, faces: jnp.ndarray,
                         target_vertices: jnp.ndarray) -> jnp.ndarray:
    """Map hit points onto another mesh with the same topology.

    Used for ground-truth warps: a hit on the goal mesh maps to the canonical
    mesh through the hit face's barycentric coordinates (the reference solves a
    3x3 linear system per hit instead, render.py:291-298 — barycentric transfer
    is the same map, vectorized).  Returns [R, 3]; zeros where no hit.
    """
    face_verts = target_vertices[faces[jnp.maximum(hits.face_idx, 0)]]  # [R, 3, 3]
    pts = jnp.sum(hits.bary[..., None] * face_verts, -2)
    return jnp.where(hits.hit[:, None], pts, 0.0)
