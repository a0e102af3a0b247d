"""CLI-level inference coverage: post-training GIF rendering + run-dir scoring.

inference_gif mirrors the reference's post-training re-render of the whole
train+val distribution in original creation order (train.py:183,203 ->
inference.py:35-110)."""
import os

import numpy as np
import pytest

from smpl_nerf_tpu import config as config_mod
from smpl_nerf_tpu.data import generate


def test_train_cli_renders_inference_gif(tmp_path):
    from smpl_nerf_tpu.cli.train import train

    d = str(tmp_path / "ds")
    parser = config_mod.dataset_config_parser()
    gargs = parser.parse_args([
        f"--save_dir={d}", "--dataset_type=smpl_nerf", "--resolution=10",
        "--camera_path=circle", "--number_steps=4", "--train_val_ratio=0.75"])
    generate.create_dataset(gargs, parser)

    log_dir = str(tmp_path / "run")
    train([
        "--config=/dev/null", "--model_type=append_smpl_params",
        f"--dataset_dir={d}", "--num_epochs=1", "--batchsize=64",
        "--batchsize_val=64", "--number_coarse_samples=4", "--run_fine=0",
        "--sigma_noise_std=0", "--netdepth=2", "--netwidth=16",
        "--number_frequencies_postitional=2", "--number_frequencies_directional=1",
        "--number_frequencies_pose=2", "--human_pose_encoding=1",
        "--use_pallas=0", "--render_gif=1", "--number_validation_images=0",
        "--steps_per_epoch=2"], log_dir=log_dir)

    # the whole train+val distribution re-rendered in creation order
    assert os.path.exists(os.path.join(log_dir, "walking.gif"))
    pngs = [f for f in os.listdir(log_dir) if f.endswith(".png")]
    # dataset_size = human_number_steps (10, frames_per_view default): the
    # whole 7-train + 3-val distribution is re-rendered
    assert len(pngs) == 10
    # run dir is self-describing and re-loadable
    assert os.path.exists(os.path.join(log_dir, "config.txt"))
    from smpl_nerf_tpu.cli.inference import render_dataset, setup_from_run_dir
    from smpl_nerf_tpu.data import datasets
    args, extras, _ = setup_from_run_dir(log_dir)
    data = datasets.load_dataset(os.path.join(d, "val"), args.model_type, args)
    out = render_dataset(args, extras, log_dir, data)
    assert out.shape == (3, 10, 10, 3) and np.isfinite(out).all()
    # fast=2 (occupancy-grid culled) falls back to the full pipeline for a
    # coarse-only run but must produce identical output through the CLI path
    out2 = render_dataset(args, extras, log_dir, data, fast=2)
    np.testing.assert_allclose(out2, out, atol=1e-6)


def test_inference_fast2_per_pose_grids_and_auto_cap(tmp_path, capsys):
    """fast=2 with a pose-VARYING dataset and a fine pass: per-image grids +
    the round-3 automatic cull-budget derivation, through the CLI path."""
    from smpl_nerf_tpu.cli.train import train

    d = str(tmp_path / "ds")
    parser = config_mod.dataset_config_parser()
    gargs = parser.parse_args([
        f"--save_dir={d}", "--dataset_type=smpl_nerf", "--resolution=10",
        "--camera_path=circle", "--number_steps=4", "--train_val_ratio=0.75"])
    generate.create_dataset(gargs, parser)
    log_dir = str(tmp_path / "run")
    train([
        "--config=/dev/null", "--model_type=append_smpl_params",
        f"--dataset_dir={d}", "--num_epochs=1", "--batchsize=64",
        "--batchsize_val=64", "--number_coarse_samples=4", "--run_fine=1",
        "--number_fine_samples=4", "--sigma_noise_std=0", "--netdepth=2",
        "--netwidth=16", "--number_frequencies_postitional=2",
        "--number_frequencies_directional=1", "--number_frequencies_pose=2",
        "--human_pose_encoding=1", "--use_pallas=0", "--render_gif=0",
        "--number_validation_images=0", "--steps_per_epoch=2",
        "--white_background=1"], log_dir=log_dir)

    from smpl_nerf_tpu.cli.inference import render_dataset, setup_from_run_dir
    from smpl_nerf_tpu.data import datasets
    args, extras, _ = setup_from_run_dir(log_dir)
    data = datasets.load_dataset(os.path.join(d, "val"), args.model_type, args)
    assert not np.all(data.human_poses == data.human_poses[:1])  # pose-varying
    full = render_dataset(args, extras, log_dir, data)
    # explicit cap=1.0: every ray fine-rendered -> must match the full render
    occ = render_dataset(args, extras, log_dir, data, fast=2, cap_fraction=1.0,
                         batch_size=50)
    np.testing.assert_allclose(occ, full, atol=1e-5)
    # auto budget (cap<=0): derives K from probe counts and stays finite
    auto = render_dataset(args, extras, log_dir, data, fast=2,
                          cap_fraction=0.0, batch_size=50)
    assert auto.shape == full.shape and np.isfinite(auto).all()
    # an explicit cap BELOW the derived safe budget must warn loudly
    # host-side (the in-jit saturation callback is disabled on this path)
    capsys.readouterr()
    render_dataset(args, extras, log_dir, data, fast=2, cap_fraction=0.02,
                   batch_size=50)
    assert "below the derived safe cull budget" in capsys.readouterr().out

    # the inference() entry persists scores.json next to the renders
    from smpl_nerf_tpu.cli.inference import inference
    save_dir = str(tmp_path / "renders")
    scores = inference([
        f"--inf_run_dir={log_dir}", f"--inf_ground_truth_dir={os.path.join(d, 'val')}",
        f"--inf_save_dir={save_dir}", "--inf_batchsize=50"])
    import json
    saved = json.load(open(os.path.join(save_dir, "scores.json")))
    assert saved["psnr"] == pytest.approx(scores["psnr"])
    assert saved["run_dir"] == log_dir
