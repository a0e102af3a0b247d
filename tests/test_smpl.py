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


def test_load_smpl_pkl_synthetic_contract(tmp_path):
    """load_smpl_pkl parses a licensed-SMPL-shaped pkl (scipy csc J_regressor,
    chumpy-free) and the result drives smpl_forward with shape blendshapes,
    pose blendshapes and differentiable LBS — the exact contract the real
    basicModel_f_lbs_10_207_0_v1.0.0.pkl arrives with (reference render.py:47).
    """
    import pickle

    import jax
    import jax.numpy as jnp
    from scipy.sparse import csc_matrix

    rng = np.random.RandomState(0)
    V, F = 60, 40
    data = {
        "v_template": rng.randn(V, 3).astype(np.float64),
        "shapedirs": (rng.randn(V, 3, 10) * 0.01).astype(np.float64),
        "posedirs": (rng.randn(V, 3, 207) * 0.001).astype(np.float64),
        "J_regressor": csc_matrix(np.abs(rng.rand(24, V)) / V),
        "weights": np.abs(rng.rand(V, 24)).astype(np.float64),
        "f": rng.randint(0, V, (F, 3)).astype(np.uint32),
        "bs_style": "lbs",
    }
    data["weights"] /= data["weights"].sum(-1, keepdims=True)
    uv = rng.rand(V, 2).astype(np.float32)
    uv_path = str(tmp_path / "uv.npy")
    np.save(uv_path, uv)
    pkl_path = str(tmp_path / "model.pkl")
    with open(pkl_path, "wb") as fh:
        pickle.dump(data, fh)

    model = smpl.load_smpl_pkl(pkl_path, uv_map_path=uv_path)
    assert model.num_vertices == V
    assert model.faces.shape == (F, 3) and model.faces.dtype == np.int32
    assert model.uv.shape == (V, 2)

    betas = jnp.asarray(rng.randn(10).astype(np.float32) * 0.5)
    pose = jnp.zeros(69)
    rest = np.asarray(smpl.smpl_forward(model, jnp.zeros(10), pose))
    shaped = np.asarray(smpl.smpl_forward(model, betas, pose))
    # shape blendshapes move the rest vertices
    assert np.abs(shaped - rest).max() > 1e-4
    # pose blendshapes + LBS: posing changes geometry and stays finite
    posed = np.asarray(smpl.smpl_forward(
        model, betas, jnp.zeros(69).at[0].set(0.4)))
    assert np.isfinite(posed).all() and np.abs(posed - shaped).max() > 1e-4
    # differentiable wrt pose (the dynamic-family requirement)
    g = jax.grad(lambda p: jnp.sum(
        smpl.smpl_forward(model, betas, p) ** 2))(jnp.zeros(69))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_textured_uv_render_path(tmp_path):
    """render_scene's UV-texture branch (the SURREAL texture path,
    reference render.py:18-73): textured pixels come from the texture."""
    from smpl_nerf_tpu.render import raytrace

    human = smpl.procedural_human(rings=3, segments=6)
    rng = np.random.RandomState(0)
    uv = rng.rand(human.num_vertices, 2).astype(np.float32)
    model = human._replace(uv=uv)
    # constant green texture -> every hit pixel must be green-ish
    texture = np.zeros((8, 8, 3), np.uint8)
    texture[..., 1] = 255
    cam = np.eye(4, dtype=np.float32)
    cam[2, 3] = 2.4
    img = raytrace.render_scene(
        np.asarray(smpl.smpl_forward(model, np.zeros(10), np.zeros(69))),
        model.faces, cam, 32, 32, np.pi / 3, uv=model.uv, texture=texture)
    hit = np.any(img != 255, axis=-1)
    assert hit.sum() > 20  # the body is visible
    hit_px = img[hit]
    assert (hit_px[:, 1].astype(int) > hit_px[:, 0].astype(int)).all()
    assert (hit_px[:, 1].astype(int) > hit_px[:, 2].astype(int)).all()


def test_distorted_betas_modes():
    """Reference get_smpl_mesh_distorted beta logic (render.py:75-139) —
    var noise, mean shift (the reference's missing `+=` is implemented as
    intended), and beta0 overwrite; the input is never mutated."""
    import numpy as np

    from smpl_nerf_tpu.models import smpl as smpl_mod

    base = smpl_mod.default_betas()
    snap = base.copy()
    noisy = smpl_mod.distorted_betas(base, var=0.25,
                                     rng=np.random.RandomState(3))
    assert noisy.shape == snap.shape
    assert np.any(noisy != snap) and np.all(base == snap)
    assert np.abs(noisy - snap).max() < 5 * 0.5  # ~N(0, 0.25) scale
    shifted = smpl_mod.distorted_betas(base, mean=0.7).reshape(-1)
    flat = snap.reshape(-1)
    np.testing.assert_allclose(shifted[0], flat[0] + 0.7, rtol=1e-6)
    np.testing.assert_allclose(shifted[1:], flat[1:])
    fixed = smpl_mod.distorted_betas(base, beta0=2.0).reshape(-1)
    assert fixed[0] == 2.0
