"""Tests for the JAX SMPL body model (LBS) and the procedural human."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.models import smpl


@pytest.fixture(scope="module")
def human():
    return smpl.procedural_human()


def test_procedural_human_shapes(human):
    V = human.num_vertices
    assert V > 2000
    assert human.faces.max() < V
    assert human.lbs_weights.shape == (V, 24)
    np.testing.assert_allclose(human.lbs_weights.sum(1), 1.0, atol=1e-5)
    assert human.vertex_colors.shape == (V, 3)
    assert human.vertex_colors.min() >= 0 and human.vertex_colors.max() <= 1


def test_rest_pose_is_template(human):
    verts = smpl.smpl_forward(human, jnp.zeros(10), jnp.zeros(69))
    # joint regressor reproduces rest joints, so zero pose => identity LBS
    np.testing.assert_allclose(np.asarray(verts), human.v_template, atol=5e-3)


def test_rest_joints_exact(human):
    np.testing.assert_allclose(human.rest_joints, smpl._REST_JOINTS, atol=0)
    # the approximate regressor should land near the joints too
    joints = human.joint_regressor @ human.v_template
    np.testing.assert_allclose(joints, smpl._REST_JOINTS, atol=0.1)


def test_rodrigues_matches_scipy():
    from scipy.spatial.transform import Rotation as R
    aa = np.array([[0.3, -0.2, 0.9], [0, 0, 0], [1e-9, 0, 0], [np.pi / 2, 0, 0]], np.float32)
    got = np.asarray(smpl.rodrigues(jnp.asarray(aa)))
    for i in range(len(aa)):
        want = R.from_rotvec(aa[i]).as_matrix()
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_arm_pose_moves_only_arm(human):
    # body_pose[41] = z-rotation of body_pose row 13 = SMPL joint 14 (R collar):
    # the "arm angle" the reference sweeps (render.py:212-219, joints [41, 38])
    pose = np.zeros(69, np.float32)
    pose[41] = np.deg2rad(45)
    rest = np.asarray(smpl.smpl_forward(human, jnp.zeros(10), jnp.zeros(69)))
    posed = np.asarray(smpl.smpl_forward(human, jnp.zeros(10), jnp.asarray(pose)))
    moved = np.linalg.norm(posed - rest, axis=1)
    right_arm = (rest[:, 0] < -0.25) & (rest[:, 1] > 0.2)
    left_arm = (rest[:, 0] > 0.25) & (rest[:, 1] > 0.2)
    leg_mask = rest[:, 1] < -0.4
    assert moved[right_arm].mean() > 0.05
    assert moved[left_arm].max() < 1e-4
    assert moved[leg_mask].max() < 1e-4


def test_smpl_forward_is_differentiable(human):
    def loss(pose):
        v = smpl.smpl_forward(human, jnp.zeros(10), pose)
        return jnp.sum(v ** 2)

    g = jax.grad(loss)(jnp.zeros(69) + 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_smpl_forward_jits(human):
    f = jax.jit(lambda p: smpl.smpl_forward(human, jnp.zeros(10), p))
    v1 = f(jnp.zeros(69))
    v2 = f(jnp.ones(69) * 0.1)
    assert not np.allclose(np.asarray(v1), np.asarray(v2))


def test_get_human_poses_sweep():
    poses = smpl.get_human_poses([41, 38], -90, 90, 5)
    assert poses.shape == (5, 1, 69)
    np.testing.assert_allclose(poses[0, 0, 41], np.deg2rad(-90), atol=1e-6)
    np.testing.assert_allclose(poses[-1, 0, 38], np.deg2rad(90), atol=1e-6)
    assert poses[2].sum() == 0  # middle of the sweep is the zero pose


def test_global_orient_and_transl(human):
    v0 = np.asarray(smpl.smpl_forward(human, jnp.zeros(10), jnp.zeros(69)))
    v_rot = np.asarray(smpl.smpl_forward(human, jnp.zeros(10), jnp.zeros(69),
                                         global_orient=jnp.asarray([0.0, np.pi, 0.0])))
    # y-rotation by pi: x and z flip (up to pivot at root joint ~origin)
    np.testing.assert_allclose(v_rot[:, 1], v0[:, 1], atol=1e-4)
    v_t = np.asarray(smpl.smpl_forward(human, jnp.zeros(10), jnp.zeros(69),
                                       transl=jnp.asarray([1.0, 2.0, 3.0])))
    np.testing.assert_allclose(v_t - v0, np.broadcast_to([[1.0, 2.0, 3.0]], v0.shape),
                               atol=1e-4)
