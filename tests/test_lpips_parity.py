"""LPIPS computation parity vs a from-scratch torch oracle (synthetic weights).

The reference downloads torchvision VGG16 + LPIPS linear heads at runtime
(util/scores.py:286-456); this image has no egress, so the weights file is
user-supplied. What CAN be validated hermetically is the COMPUTATION: build a
random-weight VGG16 with torchvision's exact `features` layout, export it
through tools/convert_vgg_weights.py (the real converter, torchvision key
names and all), and require our jnp LPIPS to match the canonical LPIPS formula
implemented independently in torch:

  normalize input (ImageNet mean/std == the LPIPS shift/scale on [-1,1]),
  tap relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, unit-normalize channels,
  squared diff, 1x1 linear head, spatial mean, sum over layers.

With this test green, plugging in the real weights (licensed/downloaded
elsewhere) gives real LPIPS numbers with no untested code.
"""
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

# torchvision VGG16 `features` module indices: convs at these positions,
# maxpools between blocks; LPIPS taps after the relu following each block's
# last conv (features indices 3, 8, 15, 22, 29)
_VGG16_LAYOUT = [
    (0, 3, 64), (2, 64, 64), "M",
    (5, 64, 128), (7, 128, 128), "M",
    (10, 128, 256), (12, 256, 256), (14, 256, 256), "M",
    (17, 256, 512), (19, 512, 512), (21, 512, 512), "M",
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_TAPS_AFTER = {2, 7, 14, 21, 28}  # conv idx whose relu output is tapped
_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def _random_vgg_state_dict(rng):
    sd = {}
    for item in _VGG16_LAYOUT:
        if item == "M":
            continue
        idx, cin, cout = item
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.randn(cout).astype(np.float32) * 0.05)
    return sd


def _torch_lpips(sd, lin_weights, x, y):
    """Canonical LPIPS from scratch (reference util/scores.py:286-456)."""

    def feats(img):
        h = (img - _MEAN) / _STD
        taps = []
        for item in _VGG16_LAYOUT:
            if item == "M":
                h = F.max_pool2d(h, 2, 2)
                continue
            idx, _, _ = item
            h = F.relu(F.conv2d(h, sd[f"features.{idx}.weight"],
                                sd[f"features.{idx}.bias"], padding=1))
            if idx in _TAPS_AFTER:
                taps.append(h)
        return taps

    fx, fy = feats(x), feats(y)
    total = 0.0
    for j, (a, b) in enumerate(zip(fx, fy)):
        a = a / a.norm(dim=1, keepdim=True).clamp_min(1e-10)
        b = b / b.norm(dim=1, keepdim=True).clamp_min(1e-10)
        d = (a - b) ** 2
        w = lin_weights[j].view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean()
    return float(total)


def test_lpips_matches_torch_oracle_through_converter(tmp_path, rng):
    sd = _random_vgg_state_dict(rng)
    lin = {}
    lin_weights = []
    for j, c in enumerate([64, 128, 256, 512, 512]):
        w = torch.tensor(np.abs(rng.randn(c)).astype(np.float32) * 0.1)
        lin[f"lin{j}.model.1.weight"] = w.view(1, c, 1, 1)
        lin_weights.append(w)

    vgg_path = str(tmp_path / "vgg16.pth")
    lin_path = str(tmp_path / "lpips_lin.pth")
    npz_path = str(tmp_path / "lpips_vgg16.npz")
    torch.save(sd, vgg_path)
    torch.save(lin, lin_path)

    # run the real converter CLI (tools/convert_vgg_weights.py)
    from tools import convert_vgg_weights
    old_argv = sys.argv
    try:
        sys.argv = ["convert_vgg_weights.py", vgg_path, lin_path, npz_path]
        convert_vgg_weights.main()
    finally:
        sys.argv = old_argv
    assert os.path.exists(npz_path)
    data = np.load(npz_path)
    assert sum(1 for k in data.files if k.endswith("_kernel")) == 13
    assert sum(1 for k in data.files if k.startswith("lin")) == 5

    x_np = rng.rand(1, 32, 32, 3).astype(np.float32)
    y_np = np.clip(x_np + 0.1 * rng.randn(1, 32, 32, 3).astype(np.float32), 0, 1)

    from smpl_nerf_tpu.evaluation import scores
    ours = scores.lpips(x_np, y_np, weights_path=npz_path)
    assert ours is not None

    want = _torch_lpips(sd, lin_weights,
                        torch.tensor(x_np).permute(0, 3, 1, 2),
                        torch.tensor(y_np).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, want, rtol=1e-4)


def test_lpips_zero_for_identical_images(tmp_path, rng):
    sd = _random_vgg_state_dict(rng)
    vgg_path = str(tmp_path / "vgg16.pth")
    npz_path = str(tmp_path / "w.npz")
    torch.save(sd, vgg_path)
    from tools import convert_vgg_weights
    old_argv = sys.argv
    try:
        sys.argv = ["convert_vgg_weights.py", vgg_path, npz_path]
        convert_vgg_weights.main()
    finally:
        sys.argv = old_argv
    from smpl_nerf_tpu.evaluation import scores
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    assert scores.lpips(x, x.copy(), weights_path=npz_path) == pytest.approx(0.0, abs=1e-6)


def test_lpips_returns_none_without_weights(tmp_path):
    from smpl_nerf_tpu.evaluation import scores
    assert scores.lpips(np.zeros((1, 16, 16, 3)), np.zeros((1, 16, 16, 3)),
                        weights_path=str(tmp_path / "missing.npz")) is None


# ------------------------------------------------------------------ rlpips
# Untrained-VGG perceptual distance (round 3): deterministic, self-contained,
# ranking-valid (LPIPS paper Table 5 shows untrained conv features already
# rank perceptual similarity well; training mostly calibrates scale).


def test_rlpips_deterministic_and_zero_on_identity(rng):
    from smpl_nerf_tpu.evaluation import scores
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.rand(2, 32, 32, 3).astype(np.float32)
    a = scores.rlpips(x, y)
    b = scores.rlpips(x, y)
    assert a == pytest.approx(b, abs=1e-7)          # cached net, same result
    assert scores.rlpips(x, x.copy()) == pytest.approx(0.0, abs=1e-6)
    assert a > 1e-4                                  # different images differ
    # a different seed gives a different (but valid) metric
    c = scores.rlpips(x, y, seed=1)
    assert c > 1e-4 and abs(c - a) > 1e-9


def test_rlpips_ranks_increasing_distortion(rng):
    """More noise => larger rlpips, monotonically (ranking validity)."""
    from smpl_nerf_tpu.evaluation import scores
    x = rng.rand(1, 32, 32, 3).astype(np.float32) * 0.6 + 0.2
    noise = rng.randn(1, 32, 32, 3).astype(np.float32)
    vals = [scores.rlpips(x, np.clip(x + s * noise, 0, 1))
            for s in (0.02, 0.08, 0.25)]
    assert vals[0] < vals[1] < vals[2]


def test_print_scores_includes_rlpips_for_large_images(rng, capsys):
    from smpl_nerf_tpu.evaluation import scores
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    y = rng.rand(1, 32, 32, 3).astype(np.float32)
    out = scores.print_scores(x, y)
    assert "rlpips" in out and out["rlpips"] > 0
    # too small for the 4-maxpool stack -> omitted, not crashed, and SAID
    # (no-silent-caps rule): the skip is announced on stdout
    capsys.readouterr()
    small = scores.print_scores(x[:, :16, :16], y[:, :16, :16])
    assert "rlpips" not in small
    assert "rlpips skipped" in capsys.readouterr().out
