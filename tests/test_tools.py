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
