"""Pinhole ray generation.

Matches the reference's `get_rays` (/root/reference/utils.py:26-54): pixel grid
in 'xy' indexing, camera looking down -z, directions rotated by the
camera-to-world rotation block, origins broadcast from the translation column.

Implemented in jnp so whole-image ray generation runs on device (the reference
did this per-image on host inside every Dataset __init__).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_rays(h: int, w: int, focal: float, camera_transform) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray origins and directions through every pixel of an h x w image.

    Returns (rays_translation [h,w,3], rays_direction [h,w,3]).
    """
    camera_transform = jnp.asarray(camera_transform, jnp.float32)
    i, j = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32), indexing="xy")
    dirs = jnp.stack([(i - w * 0.5) / focal, -(j - h * 0.5) / focal, -jnp.ones_like(i)], -1)
    rays_direction = jnp.sum(dirs[..., None, :] * camera_transform[:3, :3], -1)
    rays_translation = jnp.broadcast_to(camera_transform[:3, -1], rays_direction.shape)
    return rays_translation, rays_direction


def get_rays_batch(h: int, w: int, focal: float, camera_transforms) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized get_rays over a batch of [N,4,4] camera transforms.

    Returns (origins [N,h,w,3], directions [N,h,w,3]).
    """
    camera_transforms = jnp.asarray(camera_transforms, jnp.float32)
    i, j = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32), indexing="xy")
    dirs = jnp.stack([(i - w * 0.5) / focal, -(j - h * 0.5) / focal, -jnp.ones_like(i)], -1)
    # [N,h,w,3] = einsum over camera rotation blocks
    rays_direction = jnp.einsum("hwc,nrc->nhwr", dirs, camera_transforms[:, :3, :3],
                                precision=jax.lax.Precision.HIGHEST)
    rays_translation = jnp.broadcast_to(camera_transforms[:, None, None, :3, -1],
                                        rays_direction.shape)
    return rays_translation, rays_direction


def get_rays_batch_np(h: int, w: int, focal: float, camera_transforms) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-numpy get_rays_batch for host-side dataset loading.

    Same math as get_rays_batch but with no device involvement — dataset
    construction must not depend on (or contend for) the accelerator.
    """
    camera_transforms = np.asarray(camera_transforms, np.float32)
    i, j = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - w * 0.5) / focal, -(j - h * 0.5) / focal, -np.ones_like(i)], -1)
    rays_direction = np.einsum("hwc,nrc->nhwr", dirs, camera_transforms[:, :3, :3])
    rays_translation = np.broadcast_to(camera_transforms[:, None, None, :3, -1],
                                       rays_direction.shape)
    return rays_translation.copy(), rays_direction


def focal_from_fov(w: int, camera_angle_x: float) -> float:
    """focal = 0.5*w / tan(0.5*fov_x) — the transforms.json camera contract."""
    return 0.5 * w / float(np.tan(0.5 * camera_angle_x))
