"""Smoke tests for the CLI tools: offline viewer, path renderer, pix2pix eval."""
import os
import subprocess
import sys

import numpy as np


def test_visualize_log_data(tmp_path):
    from smpl_nerf_tpu.training import logging as log_mod
    rng = np.random.RandomState(0)
    log_mod.vedo_data(str(tmp_path), rng.rand(20, 4), rng.rand(20, 4, 3),
                      rng.rand(20, 4, 3), epoch=0)
    out = subprocess.run(
        [sys.executable, "tools/visualize_log_data.py",
         str(tmp_path / "vedo_data"), str(tmp_path / "viz")],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr
    assert any(f.endswith(".png") for f in os.listdir(tmp_path / "viz"))


def test_evaluate_pix2pix_cli(tmp_path):
    import cv2
    gt = tmp_path / "gt"
    nerf = tmp_path / "nerf"
    for d in (gt, nerf):
        os.makedirs(d)
        for i in range(2):
            cv2.imwrite(str(d / f"img_{i:03d}.png"),
                        np.random.RandomState(i).randint(0, 255, (8, 8, 3),
                                                         np.uint8))
    out = subprocess.run(
        [sys.executable, "evaluate_pix2pix.py", f"--gt_dir={gt}",
         f"--nerf_dir={nerf}", f"--out={tmp_path}/cmp.gif"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    assert (tmp_path / "cmp.gif").exists()
    assert "psnr" in out.stdout


def test_make_motion_sequence_amass_contract(tmp_path):
    """All three Table-1 motions emit AMASS-format npz the loader accepts."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for motion in ("walking", "waving", "arms_swinging"):
        out = tmp_path / f"{motion}.npz"
        r = subprocess.run(
            [sys.executable, "tools/make_motion_sequence.py",
             f"--motion={motion}", "--frames=12", f"--out={out}"],
            capture_output=True, text=True, cwd=repo)
        assert r.returncode == 0, r.stderr
        blob = np.load(out)
        assert blob["poses"].shape == (12, 156)
        # dims 0:3 (root orient) stay zero; body joints live in 3:66
        assert np.all(blob["poses"][:, :3] == 0)
        assert np.any(blob["poses"][:, 3:66] != 0)
        from smpl_nerf_tpu.data.generate import load_pose_sequence
        poses, _ = load_pose_sequence(str(out))
        assert poses.shape == (12, 1, 69)  # reference [n,1,69] contract
        flat = poses.reshape(12, 69)
        # motions must drive MULTIPLE joints and vary over time
        assert (np.ptp(flat, axis=0) > 1e-3).sum() >= 4


def test_motion_sequences_are_distinct(tmp_path):
    """waving / arms_swinging / walking produce different joint programs."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    try:
        from make_motion_sequence import MOTIONS
    finally:
        sys.path.pop(0)
    frames = {name: fn(16, 1.0) for name, fn in MOTIONS.items()}
    names = list(frames)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = frames[names[i]], frames[names[j]]
            assert np.abs(a - b).max() > 0.1, (names[i], names[j])


def test_pix2pix_baseline_tool(tmp_path):
    """depth->RGB stand-in: trains on [rgb|depth] pairs and writes scores."""
    import cv2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = np.random.RandomState(0)
    for split, n in (("train", 4), ("val", 2)):
        d = tmp_path / split
        os.makedirs(d)
        for i in range(n):
            pair = rng.randint(0, 255, (32, 64, 3), np.uint8)
            cv2.imwrite(str(d / f"img_{i:03d}.png"), pair)
    r = subprocess.run(
        [sys.executable, "tools/pix2pix_baseline.py",
         f"--dataset_dir={tmp_path}", "--epochs=1", "--batch=2",
         f"--out={tmp_path}/out"],
        capture_output=True, text=True, cwd=repo,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "out" / "scores.json").exists()
