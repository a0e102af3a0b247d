"""Multi-res dense-grid NeRF (beyond-reference fast-convergence path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.models.grid_nerf import GridNerf, trilinear_interpolate


def test_trilinear_matches_scipy(rng):
    from scipy.interpolate import RegularGridInterpolator
    res, F = 9, 3
    grid = rng.randn(res, res, res, F).astype(np.float32)
    p = rng.rand(40, 3).astype(np.float32)
    got = np.asarray(trilinear_interpolate(jnp.asarray(grid), jnp.asarray(p)))
    axes = [np.linspace(0, 1, res)] * 3
    want = np.stack([RegularGridInterpolator(axes, grid[..., f])(p)
                     for f in range(F)], -1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_trilinear_exact_at_grid_points(rng):
    res = 5
    grid = rng.randn(res, res, res, 2).astype(np.float32)
    idx = np.stack(np.meshgrid(*[np.arange(res)] * 3, indexing="ij"), -1).reshape(-1, 3)
    p = idx / (res - 1)
    got = np.asarray(trilinear_interpolate(jnp.asarray(grid), jnp.asarray(p)))
    np.testing.assert_allclose(got, grid.reshape(-1, 2), atol=1e-6)


def test_grid_nerf_shapes_and_gradients(rng):
    net = GridNerf(levels=(4, 8), features=2, width=16, n_layers=2, dir_freqs=2)
    x = jnp.asarray(rng.randn(10, 6).astype(np.float32) * 0.5)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (10, 4)
    # gradients reach the feature grids (the capacity lives there)
    g = jax.grad(lambda p: jnp.sum(net.apply(p, x) ** 2))(params)
    for res in (4, 8):
        assert np.abs(np.asarray(g["params"][f"grid_{res}"])).max() > 0


def test_grid_nerf_trains_end_to_end(tmp_path):
    """--grid_encoding=1 trains through the standard solver and converges
    FASTER than it would leave chance: loss drops hard within 2 epochs."""
    import os

    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.data import datasets, generate
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.training.factory import build_models_and_params
    from smpl_nerf_tpu.training.solver import Solver

    d = str(tmp_path / "ds")
    gparser = config_mod.dataset_config_parser()
    gargs = gparser.parse_args([
        f"--save_dir={d}", "--dataset_type=nerf", "--resolution=16",
        "--camera_path=circle", "--number_steps=4", "--train_val_ratio=0.75"])
    generate.create_dataset(gargs, gparser)

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=nerf", f"--dataset_dir={d}",
        "--grid_encoding=1", "--grid_levels=4,8,16", "--grid_features=2",
        "--grid_width=16", "--num_epochs=6", "--batchsize=128",
        "--batchsize_val=128", "--number_coarse_samples=8", "--run_fine=0",
        "--sigma_noise_std=0", "--use_pallas=0", "--lrate=1e-2"])
    train_data = datasets.load_dataset(os.path.join(d, "train"), "nerf", args)
    val_data = datasets.load_dataset(os.path.join(d, "val"), "nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    assert models["model_coarse"].takes_raw
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    solver = Solver(pipeline, params, args)
    solver.train(train_data, val_data)
    h = solver.history["train_loss"]
    assert np.isfinite(h).all() and h[-1] < 0.4 * h[0]


def test_grid_nerf_append_family_prefix(tmp_path, rng):
    """Grid encoding composes with pose conditioning (prefix columns)."""
    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.training.factory import build_models_and_params

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=append_smpl_params",
        "--grid_encoding=1", "--grid_levels=4,8", "--grid_features=2",
        "--grid_width=16", "--number_coarse_samples=4", "--run_fine=0",
        "--sigma_noise_std=0", "--use_pallas=0", "--human_pose_encoding=1",
        "--number_frequencies_pose=2"])
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    n = 12
    pose = np.zeros((n, 69), np.float32)
    pose[:, 38] = rng.uniform(-0.5, 0.5, n)
    batch = {"ray_translation": jnp.asarray(np.tile([[0, 0, 2.4]], (n, 1)).astype(np.float32)),
             "ray_direction": jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)),
             "rgb": jnp.zeros((n, 3)), "human_pose": jnp.asarray(pose)}
    out = pipeline(params, batch, None, False)
    assert out["rgb_coarse"].shape == (n, 3)
    assert np.isfinite(np.asarray(out["rgb_coarse"])).all()


def test_grid_nerf_fast_render_matches_full(rng):
    """The foreground-culled renderer composes with grid encoding (cap=1.0)."""
    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.render.fast import make_fast_renderer
    from smpl_nerf_tpu.training.factory import build_models_and_params

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=nerf", "--grid_encoding=1",
        "--grid_levels=4,8", "--grid_features=2", "--grid_width=16",
        "--number_coarse_samples=8", "--number_fine_samples=8", "--run_fine=1",
        "--sigma_noise_std=0", "--use_pallas=0"])
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    n = 32
    batch = {"ray_translation": jnp.asarray(np.tile([[0, 0, 2.4]], (n, 1)).astype(np.float32)),
             "ray_direction": jnp.asarray(
                 np.concatenate([rng.uniform(-0.3, 0.3, (n, 2)),
                                 -np.ones((n, 1))], -1).astype(np.float32)),
             "rgb": jnp.zeros((n, 3))}
    full = np.asarray(pipeline(params, batch, None, False)["rgb_fine"])
    fast = np.asarray(make_fast_renderer(pipeline, cap_fraction=1.0)(params, batch))
    np.testing.assert_allclose(fast, full, atol=1e-5)
