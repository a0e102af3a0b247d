"""Config-system tests: reference-format config files parse identically."""
import numpy as np

from smpl_nerf_tpu import config as config_mod


def test_reference_style_config_file(tmp_path):
    """A config written in the reference's configs/config.txt style parses."""
    cfg = tmp_path / "config.txt"
    cfg.write_text("""\
experiment_name = append_vertex_locations_to_nerf_with_fine_net
number_validation_images = 2
model_type = append_smpl_params
dataset_dir = data/overfit_two_arm_angles_128

netdepth = 8

run_fine = 0
netdepth_fine = 8

log_iterations = 2
batchsize = 2048
batchsize_val = 128
num_epochs = 200
skips = [4]
skips_fine= [4]

near=1.6
far=3.1
number_coarse_samples=64
number_fine_samples=64
white_background = 1
sigma_noise_std = 1
lrate = 1e-4
""")
    parser = config_mod.config_parser()
    args = parser.parse_args([f"--config={cfg}"])
    assert args.model_type == "append_smpl_params"
    assert args.batchsize == 2048
    assert args.skips == [4] and args.skips_fine == [4]
    assert args.near == 1.6 and args.far == 3.1
    assert args.white_background == 1
    assert args.lrate == 1e-4
    assert args.num_epochs == 200


def test_cli_overrides_config_file(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("batchsize = 512\nnetwidth = 128\n")
    parser = config_mod.config_parser()
    args = parser.parse_args([f"--config={cfg}", "--batchsize", "64"])
    assert args.batchsize == 64      # CLI wins
    assert args.netwidth == 128      # file value kept


def test_write_config_roundtrip(tmp_path):
    parser = config_mod.config_parser()
    args = parser.parse_args(["--config=/dev/null", "--model_type=smpl_nerf",
                              "--skips", "4", "--skips", "6", "--lrate", "0.001"])
    out = tmp_path / "resolved.txt"
    parser.write_config_file(args, [str(out)])
    args2 = parser.parse_args([f"--config={out}"])
    assert args2.model_type == "smpl_nerf"
    assert args2.skips == [4, 6]
    assert args2.lrate == 0.001


def test_append_defaults_preserved():
    parser = config_mod.config_parser()
    args = parser.parse_args(["--config=/dev/null"])
    assert args.human_joints == [41, 38]
    args2 = parser.parse_args(["--config=/dev/null", "--human_joints", "10"])
    assert args2.human_joints == [10]
