"""End-to-end test for the image_wise_dynamic analysis-by-synthesis solver."""
import os

import numpy as np
import pytest

from smpl_nerf_tpu import config as config_mod
from smpl_nerf_tpu.data import datasets, generate
from smpl_nerf_tpu.models import smpl as smpl_mod


@pytest.fixture(scope="module")
def tiny_smpl_nerf_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds_iw")
    parser = config_mod.dataset_config_parser()
    args = parser.parse_args([f"--save_dir={d}", "--dataset_type=smpl_nerf",
                              "--resolution=12", "--camera_path=circle",
                              "--number_steps=3", "--human_number_steps=3",
                              "--train_val_ratio=0.67"])
    generate.create_dataset(args, parser)
    return str(d)


def test_image_wise_solver_runs_and_updates_pose(tiny_smpl_nerf_ds):
    from smpl_nerf_tpu.training.image_wise import train_image_wise

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=image_wise_dynamic",
        f"--dataset_dir={tiny_smpl_nerf_ds}", "--num_epochs=2", "--batchsize=36",
        "--number_coarse_samples=4", "--netdepth=2", "--netwidth=16",
        "--number_frequencies_postitional=2", "--number_frequencies_directional=1",
        "--sigma_noise_std=0", "--lrate_pose=0.05", "--lrate_pose_decay=1",
        "--warp_radius=0.1",
        "--use_pallas=0", "--run_fine=0"])
    smpl_model = smpl_mod.procedural_human(rings=3, segments=6)
    train_data = datasets.load_dataset(os.path.join(tiny_smpl_nerf_ds, "train"),
                                       "image_wise_dynamic", args)
    val_data = datasets.load_dataset(os.path.join(tiny_smpl_nerf_ds, "val"),
                                     "image_wise_dynamic", args)
    extras = {"smpl_model": smpl_model, "num_vertices": smpl_model.num_vertices,
              "betas": np.zeros(10, np.float32), "num_images": train_data.num_images,
              "goal_poses": train_data.human_poses}
    final, pose_errors = train_image_wise(args, parser, train_data, val_data, extras)
    assert np.isfinite(pose_errors).all()
    # the two trainable arm angles moved from their 0 init
    est = final["smpl_estimator"]["params"]
    moved = abs(float(est["arm_angle_l"][0])) + abs(float(est["arm_angle_r"][0]))
    assert moved > 0
