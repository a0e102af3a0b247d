"""Tests for scores + inference round trip (train -> save -> load -> render -> score)."""
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from smpl_nerf_tpu.evaluation import img2mse, img2psnr, print_scores, ssim


def test_psnr_matches_formula(rng):
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    y = rng.rand(2, 8, 8, 3).astype(np.float32)
    mse = np.mean((x - y) ** 2)
    want = -10 * np.log10(mse)
    np.testing.assert_allclose(float(img2psnr(x, y)), want, rtol=1e-5)


def test_ssim_identity_is_one(rng):
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_decreases_with_noise(rng):
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    y1 = np.clip(x + 0.05 * rng.randn(*x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + 0.3 * rng.randn(*x.shape), 0, 1).astype(np.float32)
    s1, s2 = float(ssim(x, y1)), float(ssim(x, y2))
    assert 1 > s1 > s2 > 0


def _torch_ssim_oracle(x, y, kernel_size=11, sigma=1.5, k1=0.01, k2=0.03):
    """Torch oracle following the reference SSIM (util/scores.py:71-178)."""
    import torch.nn.functional as F
    coords = torch.arange(kernel_size, dtype=torch.float32) - (kernel_size - 1) / 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = (g / g.sum())
    kernel2d = torch.outer(g, g)[None, None]
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    yt = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)))
    c = xt.shape[1]
    kernel = kernel2d.repeat(c, 1, 1, 1)
    c1, c2 = k1 ** 2, k2 ** 2
    mu1 = F.conv2d(xt, kernel, groups=c)
    mu2 = F.conv2d(yt, kernel, groups=c)
    s1 = F.conv2d(xt * xt, kernel, groups=c) - mu1 ** 2
    s2 = F.conv2d(yt * yt, kernel, groups=c) - mu2 ** 2
    s12 = F.conv2d(xt * yt, kernel, groups=c) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    ss = (2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1) * cs
    return float(ss.mean())


def test_ssim_matches_torch_oracle(rng):
    x = rng.rand(2, 24, 24, 3).astype(np.float32)
    y = np.clip(x + 0.1 * rng.randn(2, 24, 24, 3), 0, 1).astype(np.float32)
    want = _torch_ssim_oracle(x, y)
    got = float(ssim(x, y))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_print_scores_returns_dict(rng, capsys):
    x = rng.rand(1, 16, 16, 3).astype(np.float32)
    out = print_scores(x, x)
    assert out["mse"] == pytest.approx(0.0, abs=1e-9)
    assert out["ssim"] == pytest.approx(1.0, abs=1e-4)


def test_inference_round_trip(tmp_path, rng):
    """Train 1 epoch, save run dir, reload through the inference path, render."""
    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.cli.inference import render_dataset, save_rerenders
    from smpl_nerf_tpu.data import datasets, generate
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.training import checkpoints
    from smpl_nerf_tpu.training.factory import build_models_and_params
    from smpl_nerf_tpu.training.solver import Solver
    import jax

    ds = tmp_path / "ds"
    gp = config_mod.dataset_config_parser()
    gargs = gp.parse_args([f"--save_dir={ds}", "--dataset_type=nerf",
                           "--resolution=12", "--camera_path=circle",
                           "--number_steps=4", "--train_val_ratio=0.75"])
    generate.create_dataset(gargs, gp)

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=nerf", f"--dataset_dir={ds}",
        "--num_epochs=1", "--batchsize=64", "--batchsize_val=64",
        "--number_coarse_samples=8", "--run_fine=0", "--sigma_noise_std=0",
        "--netdepth=2", "--netwidth=16", "--number_frequencies_postitional=2",
        "--number_frequencies_directional=1"])
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    solver = Solver(pipeline, params, args)
    solver.train(train_data, train_data)

    run_dir = tmp_path / "run"
    checkpoints.save_run(str(run_dir), solver.params, args, parser, str(ds))
    assert (run_dir / "config.txt").exists()
    assert (run_dir / "model_model_coarse.msgpack").exists()
    assert (run_dir / "create_dataset_config.txt").exists()

    # reload through the inference path (config round trip included)
    from smpl_nerf_tpu.cli.inference import setup_from_run_dir
    args2, extras2, _ = setup_from_run_dir(str(run_dir))
    assert args2.model_type == "nerf"
    assert int(args2.netwidth) == 16
    val_data = datasets.load_dataset(os.path.join(ds, "val"), "nerf", args2)
    renders = render_dataset(args2, extras2, str(run_dir), val_data)
    assert renders.shape == (val_data.num_images, 12, 12, 3)
    assert np.isfinite(renders).all()
    out_dir = tmp_path / "renders"
    save_rerenders(renders, str(out_dir))
    assert (out_dir / "img_000.png").exists()
    assert (out_dir / "walking.gif").exists()
