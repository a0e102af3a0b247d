"""Dummy SMPL estimators — test seams for pose-conditioned pipelines.

* DummySmplEstimatorModel: non-trainable table of per-image goal poses; lookup
  by image index (reference /root/reference/models/dummy_smpl_estimator_model.py:6-45).
* DummyImageWiseEstimator: two TRAINABLE scalar arm angles spliced into a frozen
  canonical 69-dim pose; used to optimize pose parameters by gradient through
  the frozen NeRF (analysis-by-synthesis; reference
  /root/reference/models/dummy_image_wise_estimator.py:7-55).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# body_pose dims: 38 = SMPL joint 13 (L collar) z-axis, 41 = joint 14
# (R collar) z-axis. The reference assembles the pose as
# [canonical(0:38), arm_angle_l, canonical(39:41), arm_angle_r,
# canonical(42:69)] (dummy_image_wise_estimator.py:33) and reports
# (l - gt[38])^2 + (r - gt[41])^2 (image_wise_solver.py:125-128).
LEFT_ARM_JOINT = 38
RIGHT_ARM_JOINT = 41


class DummySmplEstimatorModel(nn.Module):
    goal_poses: np.ndarray  # [N_images, 69]
    betas: np.ndarray       # [10]

    @nn.compact
    def __call__(self, image_indices: jnp.ndarray) -> jnp.ndarray:
        poses = self.variable("constants", "goal_poses",
                              lambda: jnp.asarray(self.goal_poses, jnp.float32))
        return jnp.take(poses.value, image_indices.astype(jnp.int32), axis=0)


class DummyImageWiseEstimator(nn.Module):
    """Trainable (arm_angle_l, arm_angle_r) inside a frozen canonical pose.

    __call__ ignores its input (matches the reference contract where the
    estimator is called with a dummy tensor) and returns the current [1, 69]
    body pose with arm_angle_l written into dim 38 and arm_angle_r into
    dim 41 (the reference's assembly order — see the module constants).
    """
    canonical_pose: np.ndarray       # [69] frozen base pose
    initial_arm_angle_l: float = 0.0
    initial_arm_angle_r: float = 0.0
    ground_truth_pose: np.ndarray | None = None  # for pose-error reporting

    @nn.compact
    def __call__(self, _x: jnp.ndarray | None = None) -> jnp.ndarray:
        arm_l = self.param("arm_angle_l",
                           lambda key: jnp.asarray([self.initial_arm_angle_l], jnp.float32))
        arm_r = self.param("arm_angle_r",
                           lambda key: jnp.asarray([self.initial_arm_angle_r], jnp.float32))
        base = jnp.asarray(self.canonical_pose, jnp.float32)
        pose = base.at[LEFT_ARM_JOINT].set(arm_l[0]).at[RIGHT_ARM_JOINT].set(arm_r[0])
        return pose[None, :]

    @staticmethod
    def pose_error(params, ground_truth_pose: np.ndarray) -> float:
        gt = np.asarray(ground_truth_pose).reshape(-1)
        pl = float(np.asarray(params["params"]["arm_angle_l"])[0])
        pr = float(np.asarray(params["params"]["arm_angle_r"])[0])
        return float(abs(pl - gt[LEFT_ARM_JOINT]) + abs(pr - gt[RIGHT_ARM_JOINT]))
