"""tools/rescore_renders.py — PNG round-trip, metric merge, mismatch guard."""
import json
import os

import numpy as np
import pytest


def _write_renders(d, imgs_bgr):
    """Persist like cli/inference.save_rerenders: BGR pipeline -> RGB files."""
    import imageio
    os.makedirs(d, exist_ok=True)
    for i, img in enumerate(imgs_bgr):
        rgb8 = (np.clip(img[..., ::-1], 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(d, f"img_{i:03d}.png"), rgb8)


def test_rescore_merges_new_metrics_and_keeps_old(tmp_path, rng, monkeypatch):
    from tools import rescore_renders as rr
    truths = rng.rand(2, 32, 32, 3).astype(np.float32)
    renders_dir = str(tmp_path / "renders")
    # renders = truths + small noise, persisted through the BGR->RGB contract
    _write_renders(renders_dir, np.clip(truths + 0.02, 0, 1))
    stored = {"psnr": 12.345, "ssim": 0.5, "note": "original"}
    json.dump(stored, open(os.path.join(renders_dir, "scores.json"), "w"))
    monkeypatch.setattr(rr, "load_truths", lambda d, m="smpl_nerf": truths)

    merged = rr.rescore(renders_dir, "unused_gt", "smpl_nerf")
    # old metrics win on collision (8-bit requantization drift), new ones add
    assert merged["psnr"] == 12.345 and merged["note"] == "original"
    assert "rlpips" in merged and merged["rlpips"] >= 0
    on_disk = json.load(open(os.path.join(renders_dir, "scores.json")))
    assert on_disk == merged


def test_rescore_roundtrip_psnr_accurate(tmp_path, rng, monkeypatch):
    """BGR<->RGB flips cancel: recomputed PSNR matches the f32 PSNR ~8-bit."""
    from tools import rescore_renders as rr
    from smpl_nerf_tpu.evaluation import scores
    truths = rng.rand(2, 32, 32, 3).astype(np.float32)
    noisy = np.clip(truths + rng.randn(*truths.shape).astype(np.float32) * 0.05, 0, 1)
    renders_dir = str(tmp_path / "renders")
    _write_renders(renders_dir, noisy)
    monkeypatch.setattr(rr, "load_truths", lambda d, m="smpl_nerf": truths)
    merged = rr.rescore(renders_dir, "unused", "smpl_nerf")
    want = float(scores.img2psnr(noisy, truths))
    assert merged["psnr"] == pytest.approx(want, abs=0.1)


def test_rescore_rejects_count_mismatch(tmp_path, rng, monkeypatch):
    from tools import rescore_renders as rr
    truths = rng.rand(3, 32, 32, 3).astype(np.float32)
    renders_dir = str(tmp_path / "renders")
    _write_renders(renders_dir, truths[:2])
    monkeypatch.setattr(rr, "load_truths", lambda d, m="smpl_nerf": truths)
    with pytest.raises(ValueError, match="renders vs"):
        rr.rescore(renders_dir, "unused", "smpl_nerf")
