"""Unit tests for core ray math against independent numpy / torch oracles.

The oracles re-derive the reference formulas (utils.py / transforms.py /
camera.py) directly in numpy or torch — they are written from the math, and the
jnp implementations must match them to float tolerance.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.core import cameras, encoding, gmm, integrate, rays, sampling


# ---------------------------------------------------------------- cameras

def test_pose_matrix_matches_scipy():
    from scipy.spatial.transform import Rotation as R
    for phi, theta, psi in [(0, 0, 0), (30, -45, 10), (-90, 17, 120)]:
        want = R.from_euler("xyz", [phi, theta, psi], degrees=True).as_matrix()
        got = cameras.get_pose_matrix(1, 2, 3, phi, theta, psi)
        np.testing.assert_allclose(got[:3, :3], want, atol=1e-12)
        np.testing.assert_allclose(got[:3, 3], [1, 2, 3], atol=1e-12)
        np.testing.assert_allclose(got[3], [0, 0, 0, 1], atol=1e-12)


def test_sphere_pose_faces_origin():
    pose = cameras.get_sphere_pose(30.0, 45.0, 2.4)
    cam_pos = pose[:3, 3]
    # camera looks down -z in its own frame; the world-space view direction
    # must point at the origin
    view_dir = -pose[:3, :3] @ np.array([0.0, 0.0, 1.0])
    to_origin = -cam_pos / np.linalg.norm(cam_pos)
    np.testing.assert_allclose(view_dir, to_origin, atol=1e-10)
    np.testing.assert_allclose(np.linalg.norm(cam_pos), 2.4, atol=1e-12)


def test_sphere_poses_grid_ordering():
    poses, angles = cameras.get_sphere_poses(-90, 90, 3, 2.0)
    assert poses.shape == (9, 4, 4)
    # reference ordering: phis tiled, thetas repeated (camera.py:138-139)
    np.testing.assert_allclose(angles[:3, 0], [-90, 0, 90])
    np.testing.assert_allclose(angles[:3, 1], [-90, -90, -90])


def test_circle_on_sphere_poses():
    poses, angles = cameras.get_circle_on_sphere_poses(8, 10.0, 2.4)
    assert poses.shape == (8, 4, 4)
    np.testing.assert_allclose(np.linalg.norm(poses[:, :3, 3], axis=1), 2.4, atol=1e-9)


def test_xyzphitheta_roundtrip():
    pose = cameras.get_sphere_pose(25.0, -40.0, 2.4)
    vec = cameras.get_xyzphitheta(pose)
    from scipy.spatial.transform import Rotation as R
    phi, theta, psi = R.from_matrix(pose[:3, :3]).as_euler("xyz", degrees=True)
    np.testing.assert_allclose(vec[3:], [-phi, theta, psi], atol=1e-9)


# ---------------------------------------------------------------- rays

def _get_rays_oracle(H, W, focal, camera_transform):
    # transliteration of the reference formula (utils.py:50-54) in numpy
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32),
                       indexing="xy")
    dirs = np.stack([(i - W * .5) / focal, -(j - H * .5) / focal, -np.ones_like(i)], -1)
    rays_direction = np.sum(dirs[..., np.newaxis, :] * camera_transform[:3, :3], -1)
    rays_translation = np.broadcast_to(camera_transform[:3, -1], rays_direction.shape)
    return rays_translation, rays_direction


def test_get_rays_matches_oracle():
    pose = cameras.get_sphere_pose(20.0, 30.0, 2.4).astype(np.float32)
    H, W, focal = 8, 12, 10.0
    want_t, want_d = _get_rays_oracle(H, W, focal, pose)
    got_t, got_d = rays.get_rays(H, W, focal, pose)
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d), want_d, atol=1e-5)


def test_get_rays_batch_matches_single():
    poses = np.stack([cameras.get_sphere_pose(p, t, 2.4) for p, t in [(0, 0), (10, 20), (-5, 40)]])
    got_t, got_d = rays.get_rays_batch(6, 6, 5.0, poses)
    for k in range(3):
        st, sd = rays.get_rays(6, 6, 5.0, poses[k])
        np.testing.assert_allclose(np.asarray(got_t)[k], np.asarray(st), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_d)[k], np.asarray(sd), atol=1e-4)


# ---------------------------------------------------------------- encoding

def _torch_positional_encoder(number_frequencies, include_identity):
    # independent torch oracle following reference utils.py:114-131
    freq_bands = torch.pow(2, torch.linspace(0., number_frequencies - 1, number_frequencies))
    fns = []
    if include_identity:
        fns.append(lambda x: x)
    for freq in freq_bands:
        for p in [torch.sin, torch.cos]:
            fns.append(lambda x, p=p, f=freq: p(x * f))
    return lambda x: torch.cat([fn(x) for fn in fns], -1)


@pytest.mark.parametrize("L,identity", [(10, False), (4, True), (1, False)])
def test_positional_encoding_matches_torch_oracle(L, identity, rng):
    x = rng.randn(7, 5, 3).astype(np.float32)
    enc = encoding.PositionalEncoder(L, identity)
    got = np.asarray(enc.encode(jnp.asarray(x)))
    want = _torch_positional_encoder(L, identity)(torch.from_numpy(x)).numpy()
    assert got.shape[-1] == 3 * enc.output_dim
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------- integration

def _raw2outputs_oracle(raw, z_vals, dirs, sigma_noise_std=0.0, white_background=False):
    # numpy oracle of reference utils.py:134-191 (noise off)
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    if dirs.ndim == z_vals.ndim:
        dists = dists * np.linalg.norm(dirs, axis=-1, keepdims=True)
    else:
        dists = dists * np.linalg.norm(dirs, axis=-1)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    density = 1.0 - np.exp(-np.maximum(raw[..., 3], 0.0) * dists)
    one_minus = 1.0 - density + 1e-10
    exclusive = np.concatenate([np.ones_like(one_minus[..., :1]), one_minus[..., :-1]], -1)
    weights = density * np.cumprod(exclusive, -1)
    rgb_out = np.sum(weights[..., None] * rgb, -2)
    acc = np.sum(weights, -1)
    if white_background:
        rgb_out = rgb_out + (1.0 - acc[..., None])
    return rgb_out, weights, density


@pytest.mark.parametrize("white", [False, True])
def test_raw2outputs_matches_oracle(white, rng):
    R, S = 16, 9
    raw = rng.randn(R, S, 4).astype(np.float32)
    z_vals = np.sort(rng.uniform(1, 4, (R, S)).astype(np.float32), -1)
    dirs = rng.randn(R, 3).astype(np.float32)
    want_rgb, want_w, want_d = _raw2outputs_oracle(raw, z_vals, dirs, white_background=white)
    out = integrate.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(dirs),
                                sigma_noise_std=0.0, white_background=white)
    np.testing.assert_allclose(np.asarray(out.rgb), want_rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.weights), want_w, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.density), want_d, atol=1e-5)


def test_raw2outputs_per_sample_directions(rng):
    R, S = 4, 6
    raw = rng.randn(R, S, 4).astype(np.float32)
    z_vals = np.sort(rng.uniform(1, 4, (R, S)).astype(np.float32), -1)
    dirs = rng.randn(R, S, 3).astype(np.float32)
    want_rgb, _, _ = _raw2outputs_oracle(raw, z_vals, dirs)
    out = integrate.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(out.rgb), want_rgb, atol=1e-5)


def test_raw2outputs_single_sample_path(rng):
    raw = rng.randn(5, 1, 4).astype(np.float32)
    z_vals = np.ones((5, 1), np.float32)
    out = integrate.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals),
                                jnp.ones((5, 3), np.float32))
    want = 1.0 / (1.0 + np.exp(-raw[:, 0, :3]))
    np.testing.assert_allclose(np.asarray(out.rgb), want, atol=1e-6)


def test_raw2outputs_sigma_noise_changes_output(rng):
    raw = rng.randn(8, 5, 4).astype(np.float32)
    z_vals = np.sort(rng.uniform(1, 4, (8, 5)).astype(np.float32), -1)
    dirs = rng.randn(8, 3).astype(np.float32)
    clean = integrate.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(dirs))
    noisy = integrate.raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(dirs),
                                  sigma_noise_std=1.0, rng=jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(clean.rgb), np.asarray(noisy.rgb))


# ---------------------------------------------------------------- sampling

def test_coarse_bins_disparity_linear():
    z = np.asarray(sampling.coarse_bins(1.0, 4.0, 64))
    t = np.linspace(0, 1, 64)
    want = 1.0 / (1.0 / 1.0 * (1 - t) + 1.0 / 4.0 * t)
    np.testing.assert_allclose(z, want, rtol=1e-6)


def test_coarse_sampling_shared_jitter():
    o = jnp.zeros((10, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (10, 1))
    samples, z_vals = sampling.coarse_sampling(o, d, 1.0, 4.0, 64,
                                               rng=jax.random.PRNGKey(1))
    z = np.asarray(z_vals)
    base = np.asarray(sampling.coarse_bins(1.0, 4.0, 64))
    mids = 0.5 * (base[1:] + base[:-1])
    upper = np.concatenate([mids, base[-1:]])
    lower = np.concatenate([base[:1], mids])
    # per-ray jitter is a single scalar shared across bins
    jitter = (z - lower) / (upper - lower)
    np.testing.assert_allclose(jitter, jitter[:, :1] * np.ones_like(jitter), atol=1e-4)
    # different rays get different jitters
    assert np.std(jitter[:, 0]) > 1e-3
    np.testing.assert_allclose(np.asarray(samples), np.asarray(o)[:, None]
                               + np.asarray(d)[:, None] * z[..., None], atol=1e-6)


def test_searchsorted_right_matches_numpy(rng):
    for (B, K, Q) in [(1, 1, 1), (7, 65, 128), (3, 12, 5)]:
        a = np.sort(rng.randn(B, K).astype(np.float32), -1)
        v = rng.randn(B, Q).astype(np.float32)
        got = np.asarray(sampling.searchsorted_right(jnp.asarray(a), jnp.asarray(v)))
        want = np.stack([np.searchsorted(a[b], v[b], side="right") for b in range(B)])
        np.testing.assert_array_equal(got, want)


def _sample_pdf_oracle(bins, weights, n_fine):
    # numpy transliteration of reference utils.py:194-228
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    u = np.broadcast_to(np.linspace(0, 1, n_fine), cdf.shape[:-1] + (n_fine,))
    inds = np.stack([np.searchsorted(cdf[b], u[b], side="right") for b in range(cdf.shape[0])])
    below = np.maximum(0, inds - 1)
    above = np.minimum(cdf.shape[-1] - 1, inds)
    cdf_g0 = np.take_along_axis(cdf, below, -1)
    cdf_g1 = np.take_along_axis(cdf, above, -1)
    bins_g0 = np.take_along_axis(bins, np.minimum(below, bins.shape[-1] - 1), -1)
    bins_g1 = np.take_along_axis(bins, np.minimum(above, bins.shape[-1] - 1), -1)
    denom = cdf_g1 - cdf_g0
    denom = np.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def test_sample_pdf_matches_oracle(rng):
    R, K, F = 9, 63, 128
    bins = np.sort(rng.uniform(1, 4, (R, K)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (R, K - 1)).astype(np.float32)
    got = np.asarray(sampling.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), F))
    want = _sample_pdf_oracle(bins, weights, F)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_sample_pdf_deterministic_u():
    # reference quirk: u = linspace, so two calls agree exactly
    bins = jnp.linspace(1, 4, 63)[None].repeat(4, 0)
    weights = jnp.ones((4, 62))
    a = sampling.sample_pdf(bins, weights, 16)
    b = sampling.sample_pdf(bins, weights, 16)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fine_sampling_merges_and_sorts(rng):
    R, S = 6, 16
    o = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    d = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    z_vals = jnp.sort(jnp.asarray(rng.uniform(1, 4, (R, S)).astype(np.float32)), -1)
    weights = jnp.asarray(rng.uniform(0, 1, (R, S)).astype(np.float32))
    z_all, samples = sampling.fine_sampling(o, d, z_vals, weights, 32)
    assert z_all.shape == (R, S + 32)
    assert samples.shape == (R, S + 32, 3)
    z = np.asarray(z_all)
    assert (np.diff(z, axis=-1) >= 0).all()
    np.testing.assert_allclose(np.asarray(samples),
                               np.asarray(o)[:, None] + np.asarray(d)[:, None] * z[..., None],
                               atol=1e-5)


def test_fine_sampling_stops_gradient(rng):
    o = jnp.zeros((2, 3))
    d = jnp.asarray([[0., 0., -1.]] * 2)
    z_vals = jnp.sort(jnp.asarray(rng.uniform(1, 4, (2, 8)).astype(np.float32)), -1)

    def f(w):
        z_all, _ = sampling.fine_sampling(o, d, z_vals, w, 8)
        return jnp.sum(z_all)

    g = jax.grad(f)(jnp.asarray(rng.uniform(0, 1, (2, 8)).astype(np.float32)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


# ---------------------------------------------------------------- gmm

def test_gmm_matches_torch_oracle(rng):
    means = rng.randn(50, 3).astype(np.float32)
    std = 0.07
    g = gmm.GaussianMixture(means, std)
    samples = rng.randn(4, 6, 3).astype(np.float32)
    got = np.asarray(g.pdf(jnp.asarray(samples)))
    # torch oracle following reference utils.py:88-111
    t_means = torch.from_numpy(means)
    var = std ** 2
    factor = 1 / np.sqrt((2 * np.pi) ** 3 * var ** 3)
    mu = t_means[None, None].repeat(4, 6, 1, 1)
    diff = torch.from_numpy(samples)[..., None, :] - mu
    probs = factor * torch.exp(-0.5 * torch.sum(diff ** 2, -1) / var)
    want = (torch.sum(probs, -1) / 50).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_modified_softmax_zero_maps_to_zero():
    x = jnp.asarray([[0.0, 0.0, 5.0, 0.0]])
    out = np.asarray(gmm.modified_softmax(x))
    np.testing.assert_allclose(out[0, [0, 1, 3]], 0.0, atol=1e-7)
    assert out[0, 2] > 0
