"""Observability: TensorBoard image grids, warp point clouds, density dumps.

Parity with the reference's logging helpers (utils.py:381-481):
  * tensorboard_rerenders — GT-vs-rerender matplotlib grids, optional warp
    magnitude column (utils.py:381-428). Images are BGR in the pipeline (cv2
    contract) and flipped here for display exactly like the reference
    (utils.py:383 `[..., ::-1]`),
  * tensorboard_warps — 3D warp point cloud via writer.add_mesh, colored by
    warp magnitude (utils.py:431-445),
  * vedo_data — density/warp point-sample .npz dumps consumed by
    tools/visualize_log_data.py (utils.py:448-481; the reference's viewer used
    vedo, ours ships a matplotlib fallback since vedo isn't in the image).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _fig_to_array(fig) -> np.ndarray:
    import matplotlib.pyplot as plt  # noqa: F401
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    return buf


def tensorboard_rerenders(writer, number_validation_images: int,
                          rerenders: np.ndarray, ground_truths: np.ndarray,
                          step: int, ray_warps: Optional[np.ndarray] = None,
                          tag: str = "val/rerenders"):
    """Log a grid figure: row per image, columns [GT, render, |warp|?]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(number_validation_images, len(rerenders))
    if n == 0 or writer is None:
        return
    cols = 3 if ray_warps is not None else 2
    fig, axes = plt.subplots(n, cols, figsize=(3 * cols, 3 * n), squeeze=False)
    for i in range(n):
        axes[i][0].imshow(np.clip(ground_truths[i][..., ::-1], 0, 1))
        axes[i][0].set_title("ground truth")
        axes[i][1].imshow(np.clip(rerenders[i][..., ::-1], 0, 1))
        axes[i][1].set_title("rerender")
        if ray_warps is not None:
            mag = np.linalg.norm(ray_warps[i], axis=-1) if ray_warps[i].ndim == 3 \
                else ray_warps[i]
            im = axes[i][2].imshow(mag)
            axes[i][2].set_title("warp magnitude")
            fig.colorbar(im, ax=axes[i][2])
        for ax in axes[i]:
            ax.axis("off")
    img = _fig_to_array(fig)
    plt.close(fig)
    writer.add_image(tag, img, step, dataformats="HWC")


def tensorboard_warps(writer, step: int, points: np.ndarray, warps: np.ndarray,
                      tag: str = "warp_cloud"):
    """3D point cloud of sample positions colored by warp magnitude."""
    if writer is None or not hasattr(writer, "add_mesh"):
        return
    pts = points.reshape(1, -1, 3)
    mag = np.linalg.norm(warps.reshape(-1, 3), axis=-1)
    mag = mag / max(float(mag.max()), 1e-8)
    colors = np.stack([mag, np.zeros_like(mag), 1.0 - mag], -1)
    colors = (colors * 255).astype(np.int32).reshape(1, -1, 3)
    try:
        writer.add_mesh(tag, vertices=pts, colors=colors, global_step=step)
    except Exception:  # noqa: BLE001 — add_mesh needs optional deps sometimes
        pass


def vedo_data(log_dir: str, densities: np.ndarray, samples: np.ndarray,
              warps: Optional[np.ndarray] = None, epoch: int = 0,
              image_idx: int = 0):
    """Dump density-weighted point samples for the offline 3D viewer."""
    out_dir = os.path.join(log_dir, "vedo_data")
    os.makedirs(out_dir, exist_ok=True)
    payload = {"density_samples": samples.reshape(-1, 3),
               "densities": densities.reshape(-1)}
    if warps is not None:
        payload["warp_samples"] = samples.reshape(-1, 3)
        payload["warps"] = warps.reshape(-1, 3)
    np.savez(os.path.join(out_dir, f"epoch_{epoch}_img_{image_idx}.npz"), **payload)
