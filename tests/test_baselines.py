"""Tests for the baselines: nearest neighbors + silhouette pose fitting."""
import numpy as np
import pytest

from smpl_nerf_tpu.baselines import nearest_neighbors as nn_mod
from smpl_nerf_tpu.core import cameras


def test_nearest_neighbor_picks_identical_camera():
    cams = np.stack([cameras.get_sphere_pose(p, t, 2.4)
                     for p, t in [(0, 0), (20, 30), (-40, 10), (5, 80)]])
    idx = nn_mod.nearest_neighbor_indices(cams, cams[[2, 0]])
    np.testing.assert_array_equal(idx, [2, 0])


def test_nearest_neighbor_uses_pose_distance():
    cam = cameras.get_sphere_pose(0, 0, 2.4)
    cams = np.stack([cam, cam])
    poses = np.zeros((2, 69), np.float32)
    poses[1, 38] = 1.0
    q_pose = np.zeros((1, 69), np.float32)
    q_pose[0, 38] = 0.9
    idx = nn_mod.nearest_neighbor_indices(cams, cams[:1], poses, q_pose)
    np.testing.assert_array_equal(idx, [1])


def test_max_mixture_prior_from_synthetic_gmm(tmp_path):
    import pickle
    import jax.numpy as jnp
    from smpl_nerf_tpu.baselines.pose_priors import MaxMixturePrior

    rng = np.random.RandomState(0)
    K = 3
    means = rng.randn(K, 69).astype(np.float64)
    covars = np.stack([np.eye(69) * (0.5 + 0.1 * k) for k in range(K)])
    weights = np.array([0.5, 0.3, 0.2])
    path = tmp_path / "gmm.pkl"
    with open(path, "wb") as fh:
        pickle.dump({"means": means, "covars": covars, "weights": weights}, fh)
    prior = MaxMixturePrior.load(str(path))
    # nll at a component mean is lower than far away
    at_mean = float(prior(jnp.asarray(means[0], jnp.float32)))
    far = float(prior(jnp.asarray(means[0] + 5.0, jnp.float32)))
    assert at_mean < far
    assert MaxMixturePrior.load(str(tmp_path / "missing.pkl")) is None


@pytest.mark.slow
def test_silhouette_pose_fit_recovers_arm_angle():
    """Analysis-by-synthesis sanity: recover a single arm angle from a mask."""
    import jax.numpy as jnp
    from smpl_nerf_tpu.baselines.silhouette_pose_fit import fit_pose_to_silhouette
    from smpl_nerf_tpu.models import smpl as smpl_mod
    from smpl_nerf_tpu.render import raytrace

    model = smpl_mod.procedural_human(rings=3, segments=6)
    gt_pose = np.zeros(69, np.float32)
    gt_pose[41] = 0.6
    cam = cameras.get_sphere_pose(0.0, 0.0, 2.4)
    fov = np.pi / 3
    verts = np.asarray(smpl_mod.smpl_forward(model, jnp.zeros(10), jnp.asarray(gt_pose)))
    img = raytrace.render_scene(verts, model.faces, cam, 64, 64, fov,
                                vertex_colors=model.vertex_colors)
    mask = (img < 250).any(-1)

    pose, losses = fit_pose_to_silhouette(
        model, mask, cam, fov, steps=150, lr=0.03,
        free_joints=np.array([41]))
    assert losses[-1] < losses[0]
    assert abs(pose[41] - 0.6) < 0.25


def test_max_mixture_prior_synthetic_gmm(tmp_path):
    """MaxMixturePrior on a synthetic SMPLify-layout gmm pkl vs a numpy oracle
    (the real gmm_08.pkl is MPI-licensed; the LOADER + MATH are validated
    hermetically, reference util/prior.py:36-231)."""
    import pickle

    import jax.numpy as jnp
    from smpl_nerf_tpu.baselines.pose_priors import MaxMixturePrior

    rng = np.random.RandomState(0)
    K, D = 4, 69
    means = rng.randn(K, D).astype(np.float64)
    covars = np.stack([np.eye(D) * (0.5 + rng.rand()) +
                       0.05 * np.outer(v := rng.randn(D), v) for _ in range(K)])
    weights = rng.dirichlet(np.ones(K))
    path = str(tmp_path / "gmm_04.pkl")
    with open(path, "wb") as fh:
        pickle.dump({"means": means, "covars": covars, "weights": weights}, fh)

    prior = MaxMixturePrior.load(path)
    assert prior is not None
    assert MaxMixturePrior.load(str(tmp_path / "missing.pkl")) is None

    pose = rng.randn(D).astype(np.float32) * 0.3
    got = float(prior(jnp.asarray(pose)))
    # oracle straight from the definition
    want = np.inf
    for k in range(K):
        d = pose - means[k]
        quad = 0.5 * d @ np.linalg.inv(covars[k]) @ d
        c = 0.5 * np.linalg.slogdet(covars[k])[1] - np.log(weights[k])
        want = min(want, quad + c)
    np.testing.assert_allclose(got, want, rtol=1e-3)
    # batched poses broadcast
    batch = rng.randn(5, D).astype(np.float32) * 0.3
    assert prior(jnp.asarray(batch)).shape == (5,)
