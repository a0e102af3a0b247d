"""Tests for observability: rerender grids, warp clouds, vedo dumps, writer wiring."""
import os

import numpy as np

from smpl_nerf_tpu.training import logging as log_mod


class FakeWriter:
    def __init__(self):
        self.images = []
        self.meshes = []
        self.scalars = []

    def add_image(self, tag, img, step, dataformats="HWC"):
        self.images.append((tag, img.shape, step))

    def add_mesh(self, tag, vertices=None, colors=None, global_step=None):
        self.meshes.append((tag, vertices.shape, global_step))

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, value, step))


def test_tensorboard_rerenders_logs_grid(rng):
    w = FakeWriter()
    renders = rng.rand(2, 8, 8, 3).astype(np.float32)
    gts = rng.rand(2, 8, 8, 3).astype(np.float32)
    log_mod.tensorboard_rerenders(w, 2, renders, gts, step=5)
    assert len(w.images) == 1
    tag, shape, step = w.images[0]
    assert step == 5 and shape[-1] == 3


def test_tensorboard_rerenders_with_warps(rng):
    w = FakeWriter()
    renders = rng.rand(1, 8, 8, 3).astype(np.float32)
    gts = rng.rand(1, 8, 8, 3).astype(np.float32)
    warps = rng.rand(1, 8, 8).astype(np.float32)
    log_mod.tensorboard_rerenders(w, 1, renders, gts, step=1, ray_warps=warps)
    assert len(w.images) == 1


def test_tensorboard_warps_mesh(rng):
    w = FakeWriter()
    pts = rng.rand(50, 3).astype(np.float32)
    warps = rng.rand(50, 3).astype(np.float32)
    log_mod.tensorboard_warps(w, 3, pts, warps)
    assert len(w.meshes) == 1


def test_vedo_data_dump(tmp_path, rng):
    densities = rng.rand(10, 4).astype(np.float32)
    samples = rng.rand(10, 4, 3).astype(np.float32)
    warps = rng.rand(10, 4, 3).astype(np.float32)
    log_mod.vedo_data(str(tmp_path), densities, samples, warps, epoch=2, image_idx=1)
    path = tmp_path / "vedo_data" / "epoch_2_img_1.npz"
    assert path.exists()
    data = np.load(path)
    assert data["densities"].shape == (40,)
    assert data["warps"].shape == (40, 3)


def test_solver_logs_through_writer(tmp_path, rng):
    """Full epoch with a writer: scalars + a rerender grid get logged."""
    import jax
    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.data import datasets, generate
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.training.factory import build_models_and_params
    from smpl_nerf_tpu.training.solver import Solver

    ds = tmp_path / "ds"
    gp = config_mod.dataset_config_parser()
    gargs = gp.parse_args([f"--save_dir={ds}", "--dataset_type=nerf",
                           "--resolution=8", "--camera_path=circle",
                           "--number_steps=4", "--train_val_ratio=0.75"])
    generate.create_dataset(gargs, gp)
    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=nerf", f"--dataset_dir={ds}",
        "--num_epochs=1", "--batchsize=32", "--batchsize_val=32",
        "--number_coarse_samples=4", "--run_fine=0", "--sigma_noise_std=0",
        "--netdepth=2", "--netwidth=16", "--number_frequencies_postitional=2",
        "--number_frequencies_directional=1", "--number_validation_images=1"])
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "nerf", args)
    val_data = datasets.load_dataset(os.path.join(ds, "val"), "nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    writer = FakeWriter()
    solver = Solver(pipeline, params, args, log_dir=str(tmp_path / "run"),
                    writer=writer)
    solver.train(train_data, val_data)
    assert any(t == "loss/train" for t, _, _ in writer.scalars)
    assert len(writer.images) >= 1
    assert os.path.exists(tmp_path / "run" / "vedo_data")
