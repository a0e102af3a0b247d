"""Image quality scores: MSE / PSNR / SSIM / LPIPS.

Mirrors /root/reference/util/scores.py:
  * img2mse / img2psnr (scores.py:11-48),
  * from-scratch SSIM with an 11x11 sigma-1.5 gaussian window, VALID padding,
    per-channel conv, k1=0.01 k2=0.03 (scores.py:71-178),
  * LPIPS on VGG16 relu feature stacks (scores.py:286-456). The reference
    downloads torchvision VGG16 + linear-head weights at runtime; this image
    has no egress and no torchvision, so lpips() computes from a local weights
    file (npz; see Vgg16Features.load) and returns None with a warning when
    weights are unavailable — PSNR/SSIM (the paper's primary metrics) never
    need external data.

All metrics are jnp (jit-able, run on TPU for whole render batches at once).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.asarray(x) - jnp.asarray(y)) ** 2)


def img2psnr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    mse = img2mse(x, y)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(x, y, kernel_size: int = 11, kernel_sigma: float = 1.5,
         data_range: float = 1.0, k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """SSIM over [N, H, W, C] (or [H, W, C]) images in [0, data_range]."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.ndim == 3:
        x, y = x[None], y[None]
    x = x / data_range
    y = y / data_range
    kernel = _gaussian_kernel(kernel_size, kernel_sigma)
    n, h, w, c = x.shape
    # depthwise valid conv via lax.conv_general_dilated with feature groups
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))  # [kh, kw, 1, C]

    def dconv(img):
        # Precision.HIGHEST: TPU convs default to bf16 multiplies, and the
        # E[x^2] - mu^2 variance terms below cancel catastrophically at that
        # precision (negative variances -> SSIM windows > 1 on near-constant
        # backgrounds). CPU/GPU are unaffected; TPU needs the f32 path.
        return jax.lax.conv_general_dilated(
            img, k, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    c1 = (k1 * 1.0) ** 2
    c2 = (k2 * 1.0) ** 2
    mu1, mu2 = dconv(x), dconv(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = dconv(x * x) - mu1_sq
    sigma2_sq = dconv(y * y) - mu2_sq
    sigma12 = dconv(x * y) - mu1_mu2
    cs = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ss = (2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1) * cs
    return jnp.mean(ss)


# ---------------------------------------------------------------- LPIPS

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512]
# relu indices after which LPIPS taps features (relu1_2, relu2_2, relu3_3,
# relu4_3, relu5_3 — reference scores.py:183-201)
_TAP_LAYERS = {1, 3, 6, 9, 12}
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
_DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "lpips_vgg16.npz")


class Vgg16Features:
    """VGG16 conv feature extractor with weights from a local npz file.

    npz keys: conv{i}_kernel [kh,kw,in,out], conv{i}_bias; optionally
    lin{j}_weight [C] for the LPIPS linear heads (uniform weights otherwise).
    A converter from a torchvision state_dict is provided in
    tools/convert_vgg_weights.py for machines with access to the weights.
    """

    def __init__(self, weights: dict):
        self.weights = weights
        self.has_lin = any(k.startswith("lin") for k in weights)

    @classmethod
    def load(cls, path: str = _DEFAULT_WEIGHTS) -> Optional["Vgg16Features"]:
        if not os.path.exists(path):
            return None
        data = np.load(path)
        return cls({k: jnp.asarray(data[k]) for k in data.files})

    @classmethod
    def random(cls, seed: int = 0) -> "Vgg16Features":
        """Deterministic He-initialized (untrained) VGG16 for rLPIPS.

        The LPIPS paper (Zhang et al. 2018, Table 5) shows feature distances
        of *untrained* conv nets already rank perceptual similarity far above
        pixel metrics; the trained weights mostly calibrate the scale. With
        the licensed torchvision weights egress-gated in this environment,
        rlpips() uses this fixed-seed random net: its VALUES are not
        comparable to published LPIPS numbers, but it is a deterministic,
        reproducible perceptual distance valid for ranking methods against
        each other on the same data (lower = perceptually closer).
        """
        rng = np.random.default_rng(seed)
        weights = {}
        cin, conv_i = 3, 0
        for v in _VGG16_CFG:
            if v == "M":
                continue
            std = np.sqrt(2.0 / (3 * 3 * cin))
            weights[f"conv{conv_i}_kernel"] = jnp.asarray(
                rng.normal(0.0, std, (3, 3, cin, v)).astype(np.float32))
            weights[f"conv{conv_i}_bias"] = jnp.zeros((v,), jnp.float32)
            cin, conv_i = v, conv_i + 1
        return cls(weights)

    def features(self, img: jnp.ndarray):
        """img [N, H, W, 3] in [0,1] -> list of tapped normalized features."""
        x = (img - _IMAGENET_MEAN) / _IMAGENET_STD
        taps = []
        conv_i = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                          (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
                continue
            k = self.weights[f"conv{conv_i}_kernel"]
            b = self.weights[f"conv{conv_i}_bias"]
            # Precision.HIGHEST: TPU convs default to bf16 multiplies, which
            # would make on-chip (r)LPIPS drift from host-computed values (the
            # same hazard the SSIM variance terms hit); f32 keeps the metric
            # platform-consistent.
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST) + b
            x = jax.nn.relu(x)
            if conv_i in _TAP_LAYERS:
                taps.append(x)
            conv_i += 1
        return taps


def _lpips_from_net(net: Vgg16Features, x, y, batch: int = 8) -> float:
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.ndim == 3:
        x, y = x[None], y[None]
    n = x.shape[0]
    total, count = 0.0, 0
    for s in range(0, n, batch):  # chunk: tap features are N*H*W*64 floats
        fx, fy = net.features(x[s:s + batch]), net.features(y[s:s + batch])
        m = int(x[s:s + batch].shape[0])
        per = 0.0
        for j, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            if net.has_lin and f"lin{j}_weight" in net.weights:
                per = per + jnp.mean(jnp.sum(d * net.weights[f"lin{j}_weight"], -1))
            else:
                per = per + jnp.mean(jnp.sum(d, -1) / d.shape[-1])
        total += float(per) * m
        count += m
    return total / max(count, 1)


def lpips(x, y, weights_path: str = _DEFAULT_WEIGHTS) -> Optional[float]:
    """LPIPS distance between [N,H,W,3] image batches in [0,1]; None if no weights."""
    net = Vgg16Features.load(weights_path)
    if net is None:
        return None
    return _lpips_from_net(net, x, y)


_RANDOM_NET = None


def rlpips(x, y, seed: int = 0) -> float:
    """LPIPS on a fixed-seed UNTRAINED VGG16 (see Vgg16Features.random).

    Deterministic and self-contained (no licensed weights); use for ranking
    methods on the same dataset, never for comparing against published LPIPS.
    """
    global _RANDOM_NET
    if seed != 0:
        return _lpips_from_net(Vgg16Features.random(seed), x, y)
    if _RANDOM_NET is None:
        _RANDOM_NET = Vgg16Features.random(0)
    return _lpips_from_net(_RANDOM_NET, x, y)


def print_scores(renders, truths) -> dict:
    """MSE/PSNR/SSIM/LPIPS over [N,H,W,3] batches — reference scores.py:457-464.

    `rlpips` (untrained-VGG perceptual distance, see rlpips()) is included for
    images >= 32px (the 4-maxpool stack needs that much) unless
    SMPL_NERF_TPU_NO_RLPIPS=1; real LPIPS additionally when the licensed VGG16
    weights file exists.
    """
    out = {
        "mse": float(img2mse(renders, truths)),
        "psnr": float(img2psnr(renders, truths)),
        "ssim": float(ssim(renders, truths)),
    }
    shape = np.shape(renders)
    hw = shape[-3:-1] if len(shape) >= 3 else (0, 0)
    if min(hw) >= 32 and not os.environ.get("SMPL_NERF_TPU_NO_RLPIPS"):
        out["rlpips"] = rlpips(renders, truths)
    elif min(hw) < 32:
        # no silent caps: say why the perceptual column is absent
        print(f"rlpips skipped: images are {hw[0]}x{hw[1]} but the 4-maxpool "
              "VGG stack needs >= 32px per side")
    lp = lpips(renders, truths)
    if lp is not None:
        out["lpips"] = lp
    else:
        print("LPIPS skipped: no local VGG16 weights "
              f"(expected at {_DEFAULT_WEIGHTS}); rlpips (untrained-VGG, "
              "ranking-only) reported instead where present")
    print(" ".join(f"{k}: {v:.4f}" if abs(v) >= 1e-3 else f"{k}: {v:.3e}"
                   for k, v in out.items()))
    return out
