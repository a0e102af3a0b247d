"""Ray-traced mesh renderer for synthetic dataset generation.

Replaces pyrender's OffscreenRenderer (used by the reference at
render.py:322-367) with a jnp ray tracer that runs on TPU: one closest-hit
query per pixel (ops/raymesh Möller–Trumbore), barycentric attribute
interpolation (vertex colors or UV texture lookup), Lambertian shading with a
camera-headlight directional light — matching the reference's light rig
(DirectionalLight at the camera pose, render.py:361-362) — over a white
background (pyrender's default clear color).

This also produces the depth and ground-truth warp maps the 'smpl' dataset type
needs (reference get_warp, render.py:222-319) from the same intersection data,
where the reference ran a second trimesh pass plus a per-hit 3x3 linear solve.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from smpl_nerf_tpu.core import rays as rays_mod
from smpl_nerf_tpu.ops import raymesh

_AMBIENT = 0.45
_DIFFUSE = 0.65


def _shade(vertices: np.ndarray, faces: np.ndarray, hits: raymesh.RayHits,
           base_color: jnp.ndarray, view_dir: jnp.ndarray,
           bg_color) -> jnp.ndarray:
    """Lambertian headlight shading of per-ray base colors."""
    tri = jnp.asarray(vertices)[jnp.asarray(faces)[jnp.maximum(hits.face_idx, 0)]]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    # headlight: light direction == viewing direction; two-sided shading
    lambert = jnp.abs(jnp.sum(n * view_dir, -1))
    shade = _AMBIENT + _DIFFUSE * lambert
    rgb = jnp.clip(base_color * shade[:, None], 0.0, 1.0)
    bg = jnp.asarray(bg_color, jnp.float32)
    return jnp.where(hits.hit[:, None], rgb, bg)


def render_scene(vertices: np.ndarray, faces: np.ndarray,
                 camera_pose: np.ndarray, h: int, w: int, yfov: float,
                 vertex_colors: Optional[np.ndarray] = None,
                 uv: Optional[np.ndarray] = None,
                 texture: Optional[np.ndarray] = None,
                 return_depth: bool = False,
                 bg_color=(1.0, 1.0, 1.0)):
    """Render a posed mesh from a camera. Returns uint8 [h, w, 3] (+ depth [h, w]).

    Mirrors render_scene's contract (reference render.py:322-367): perspective
    camera with vertical fov `yfov`, aspect 1, directional light at the camera.
    """
    focal = rays_mod.focal_from_fov(w, yfov)  # aspect 1: fov_x == fov_y
    origins, dirs = rays_mod.get_rays(h, w, focal, np.asarray(camera_pose, np.float32))
    origins = jnp.reshape(origins, (-1, 3))
    dirs = jnp.reshape(dirs, (-1, 3))
    dirs_unit = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    hits = raymesh.intersect_rays(origins, dirs_unit, jnp.asarray(vertices, jnp.float32),
                                  jnp.asarray(faces))
    face_verts_idx = jnp.asarray(faces)[jnp.maximum(hits.face_idx, 0)]  # [N, 3]
    if texture is not None and uv is not None:
        uv_hit = jnp.sum(hits.bary[..., None] * jnp.asarray(uv, jnp.float32)[face_verts_idx], -2)
        th, tw = texture.shape[:2]
        # bilinear sample; UV origin at bottom-left (GL convention)
        x = jnp.clip(uv_hit[:, 0], 0.0, 1.0) * (tw - 1)
        y = (1.0 - jnp.clip(uv_hit[:, 1], 0.0, 1.0)) * (th - 1)
        x0, y0 = jnp.floor(x).astype(jnp.int32), jnp.floor(y).astype(jnp.int32)
        x1, y1 = jnp.minimum(x0 + 1, tw - 1), jnp.minimum(y0 + 1, th - 1)
        tex = jnp.asarray(texture, jnp.float32) / 255.0
        fx, fy = (x - x0)[:, None], (y - y0)[:, None]
        base = ((1 - fx) * (1 - fy) * tex[y0, x0] + fx * (1 - fy) * tex[y0, x1]
                + (1 - fx) * fy * tex[y1, x0] + fx * fy * tex[y1, x1])
    elif vertex_colors is not None:
        vc = jnp.asarray(vertex_colors, jnp.float32)
        base = jnp.sum(hits.bary[..., None] * vc[face_verts_idx], -2)
    else:
        base = jnp.full((origins.shape[0], 3), 0.7, jnp.float32)

    rgb = _shade(vertices, faces, hits, base, dirs_unit, bg_color)
    img = np.asarray(jnp.clip(rgb * 255.0 + 0.5, 0, 255)).astype(np.uint8).reshape(h, w, 3)
    if return_depth:
        depth = np.asarray(jnp.where(hits.hit, hits.t, 0.0)).reshape(h, w)
        return img, depth
    return img


def get_warp(canonical_vertices: np.ndarray, goal_vertices: np.ndarray,
             faces: np.ndarray, camera_transform: np.ndarray, h: int, w: int,
             camera_angle_x: float) -> Tuple[np.ndarray, np.ndarray]:
    """Ground-truth warp + depth images (goal -> canonical correspondence).

    Mirrors the reference get_warp (render.py:222-319): for each pixel ray's
    closest goal-mesh intersection, map the hit point onto the canonical mesh
    through the hit triangle's barycentric coordinates; warp = canonical - goal;
    zero where the ray misses. Depth uses the UNnormalized-direction ray
    parameterization only for hit-finding; the stored value is the euclidean
    distance camera->hit like the reference (render.py:281).
    """
    focal = rays_mod.focal_from_fov(w, camera_angle_x)
    origins, dirs = rays_mod.get_rays(h, w, focal, np.asarray(camera_transform, np.float32))
    origins = jnp.reshape(origins, (-1, 3))
    dirs = jnp.reshape(dirs, (-1, 3))
    dirs_unit = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    hits = raymesh.intersect_rays(origins, dirs_unit,
                                  jnp.asarray(goal_vertices, jnp.float32),
                                  jnp.asarray(faces))
    goal_pts = origins + dirs_unit * jnp.where(hits.hit, hits.t, 0.0)[:, None]
    canon_pts = raymesh.barycentric_transfer(hits, jnp.asarray(faces),
                                             jnp.asarray(canonical_vertices, jnp.float32))
    warp = jnp.where(hits.hit[:, None], canon_pts - goal_pts, 0.0)
    depth = jnp.where(hits.hit, hits.t, 0.0)
    return (np.asarray(warp).reshape(h, w, 3).astype(np.float32),
            np.asarray(depth).reshape(h, w).astype(np.float32))
