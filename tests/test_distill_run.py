"""End-to-end CPU smoke of tools/distill_run.py (the round-5 tiled serving
recipe): tiny dataset -> tiny trained run -> distill -> fine-tune -> ESS ->
scores.json. Covers the static nerf family AND the pose-baked append family
(per-pose serving, VERDICT round-4 item 6).

Training recipe note: tiny runs NEED --sigma_noise_std=1 +
--foreground_sample_ratio=0.5 or they collapse into the transparent
dead-relu fixed point (RESULTS.md 'Known dynamics note') and the teacher has
no density to distill."""
import json
import os

import numpy as np
import pytest

from smpl_nerf_tpu import config as config_mod
from smpl_nerf_tpu.data import generate


def _make_dataset(d, n_cams=4, n_poses=1):
    parser = config_mod.dataset_config_parser()
    argv = [f"--save_dir={d}", "--dataset_type=smpl_nerf", "--resolution=12",
            "--camera_path=circle", f"--number_steps={n_cams}",
            "--train_val_ratio=0.75"]
    if n_poses > 1:
        argv += ["--multi_human_pose=1", f"--human_number_steps={n_poses}",
                 "--human_start_angle=0", "--human_end_angle=40"]
    gargs = parser.parse_args(argv)
    generate.create_dataset(gargs, parser)


def _train_run(root, ds, model_type, extra=()):
    from smpl_nerf_tpu.cli.train import train
    log_dir = os.path.join(root, f"run_{model_type}")
    train(["--config=/dev/null", f"--model_type={model_type}",
           f"--dataset_dir={ds}", "--num_epochs=3", "--batchsize=128",
           "--batchsize_val=128", "--number_coarse_samples=8", "--run_fine=0",
           "--sigma_noise_std=1", "--foreground_sample_ratio=0.5",
           "--netdepth=2", "--netwidth=16",
           "--number_frequencies_postitional=2",
           "--number_frequencies_directional=1", "--use_pallas=0",
           "--render_gif=0", "--number_validation_images=0",
           "--steps_per_epoch=60", "--lrate=1e-3"] + list(extra),
          log_dir=log_dir)
    return log_dir


def _distill_argv(run_dir, ds, out_dir, extra=()):
    return ([f"--run_dir={run_dir}", f"--dataset_dir={ds}/val",
             f"--out_dir={out_dir}", "--grid=4", "--hidden=8", "--l_pos=2",
             "--l_dir=1", "--steps=40", "--batch=256", "--samples=8",
             "--chunk=72", "--tile=8", "--images=1", "--time_reps=1",
             "--finetune_steps=10", "--finetune_batch=64",
             "--finetune_samples=8", "--finetune_tile=8",
             "--ess=1", "--ess_probe=2", "--ess_thresh=0.01",
             "--sigma_thresh=0.05", "--probe_res=12"] + list(extra))


@pytest.fixture(scope="module")
def static_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("distill_static"))
    ds = os.path.join(root, "ds")
    _make_dataset(ds)
    run_dir = _train_run(root, ds, "nerf")
    return ds, run_dir, root


@pytest.fixture(scope="module")
def append_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("distill_append"))
    ds = os.path.join(root, "ds")
    _make_dataset(ds, n_cams=4, n_poses=2)
    run_dir = _train_run(root, ds, "append_smpl_params",
                         extra=["--human_pose_encoding=1",
                                "--number_frequencies_pose=2"])
    return ds, run_dir, root


def test_distill_static_nerf_end_to_end(static_setup):
    from tools import distill_run

    ds, run_dir, root = static_setup
    out_dir = os.path.join(root, "distill")
    out = distill_run.main(_distill_argv(run_dir, ds, out_dir))
    assert os.path.exists(os.path.join(out_dir, "scores.json"))
    assert os.path.exists(os.path.join(out_dir, "field.npz"))
    # all serving paths produced scores + latency
    assert out["teacher"]["psnr"] > 0 and out["distilled"]["psnr"] > 0
    assert out["finetune"]["overflow"] == 0
    assert out["ess"]["scores"]["psnr"] > 0
    for k in ("teacher", "tiled", "ess_tiled", "ess_bucketed"):
        assert out["latency_ms"][k] > 0
    # the distilled field actually tracks the teacher on this tiny scene
    assert out["distill_gap"]["mse"] < 0.15


def test_distill_ray_cull_head_to_head(static_setup):
    """--ray_cull: the field's cell occupancy selects foreground rays; the
    culled ESS render must (a) report latency for both teacher-rc and ess-rc,
    (b) score within noise of the full ESS render — background rays are
    exactly the skip-routed (zero-raw) rays of the full render."""
    from tools import distill_run

    ds, run_dir, root = static_setup
    out_dir = os.path.join(root, "distill")  # resumes the cached fields
    out = distill_run.main(_distill_argv(run_dir, ds, out_dir,
                                         extra=["--ray_cull=1"]))
    rc = out["ray_cull"]
    assert rc is not None
    assert rc["latency_ms"]["teacher_rc"] > 0
    assert rc["latency_ms"]["ess_rc"] > 0
    assert 0 < rc["worst_fg"] <= rc["rays_per_view"]
    assert rc["stream"] % 1 == 0 and rc["budget"] > 0
    assert abs(rc["scores"]["psnr"] - out["ess"]["scores"]["psnr"]) < 0.3


def test_distill_pose_conditioned_append(append_setup):
    """Per-pose baking: an append_smpl_params run distills at one pose and is
    scored only against same-pose views."""
    from tools import distill_run

    ds, run_dir, root = append_setup
    out_dir = os.path.join(root, "distill_pose")
    out = distill_run.main(_distill_argv(
        run_dir, ds, out_dir, extra=["--pose_image=0", "--images=0"]))
    assert out["pose_image"] == 0
    assert out["pose_views_scored"] >= 1
    # plumbing smoke: a 3-epoch toy teacher distilled for 40 steps only
    # roughly tracks — the real protocol is chain 2's 20k-step run
    assert out["distill_gap"]["mse"] < 0.5
    sjson = json.load(open(os.path.join(out_dir, "scores.json")))
    assert sjson["model_type"] == "append_smpl_params"


def test_occupancy_probe_failure_degrades_to_unbiased(static_setup,
                                                      monkeypatch, capsys):
    """A remote-compiler crash in the teacher occupancy probe (seen on-chip:
    XLA TPU fusion pass SIGILL) must degrade to unbiased distill sampling,
    loudly — never kill the stage."""
    from smpl_nerf_tpu.render import experts as ex
    from tools import distill_run

    ds, run_dir, root = static_setup
    real = ex.grid_occupancy
    calls = []

    def boom(raw_fn, *a, **kw):
        # first probe = the TEACHER occupancy (distill bias); later probes
        # (the ESS field occupancy) stay real
        if not calls:
            calls.append(1)
            raise RuntimeError("remote_compile: HTTP 500 (simulated)")
        return real(raw_fn, *a, **kw)

    monkeypatch.setattr(ex, "grid_occupancy", boom)
    out_dir = os.path.join(root, "distill_nobias_fallback")
    out = distill_run.main(_distill_argv(run_dir, ds, out_dir,
                                         extra=["--steps=5", "--ray_cull=0"]))
    assert "UNBIASED sampling" in capsys.readouterr().out
    assert out["teacher"]["psnr"] > 0  # the recipe still ran to completion


def test_append_teacher_requires_pose(append_setup):
    from tools import distill_run

    _, run_dir, _ = append_setup
    with pytest.raises(ValueError, match="pose_image"):
        distill_run.build_teacher(run_dir)


def test_distill_rejects_warp_families(tmp_path):
    from tools import distill_run

    ds = str(tmp_path / "ds")
    _make_dataset(ds)
    run_dir = _train_run(str(tmp_path), ds, "smpl_nerf",
                         extra=["--netwidth_warp=8",
                                "--number_frequencies_pose=2"])
    with pytest.raises(ValueError, match="per-pose"):
        distill_run.build_teacher(run_dir)
