#!/usr/bin/env python3
"""Offline 3D viewer for the vedo_data/*.npz density/warp dumps.

Replaces /root/reference/legacy/visualize_log_data.py (which needs vedo — not
in this image) with matplotlib 3D scatter plots; writes PNGs per epoch so it
works headless.

Usage: python tools/visualize_log_data.py runs/<run>/vedo_data [out_dir]
"""
import glob
import os
import sys

import numpy as np


def visualize(npz_path: str, out_path: str, density_threshold: float = 0.1):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(npz_path)
    samples = data["density_samples"]
    densities = data["densities"]
    mask = densities > density_threshold
    fig = plt.figure(figsize=(12, 6))
    ax = fig.add_subplot(121, projection="3d")
    if mask.any():
        sc = ax.scatter(samples[mask, 0], samples[mask, 1], samples[mask, 2],
                        c=densities[mask], s=2, cmap="viridis")
        fig.colorbar(sc, ax=ax, label="density")
    ax.set_title(f"density > {density_threshold}")
    if "warps" in data:
        ax2 = fig.add_subplot(122, projection="3d")
        w = data["warps"]
        mag = np.linalg.norm(w, axis=-1)
        pts = data["warp_samples"]
        sel = mag > 1e-4
        if sel.any():
            ax2.quiver(pts[sel, 0], pts[sel, 1], pts[sel, 2],
                       w[sel, 0], w[sel, 1], w[sel, 2], length=1.0)
        ax2.set_title("warps")
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    print("wrote", out_path)


def main():
    src = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 else src
    os.makedirs(out_dir, exist_ok=True)
    for npz in sorted(glob.glob(os.path.join(src, "*.npz"))):
        stem = os.path.splitext(os.path.basename(npz))[0]
        visualize(npz, os.path.join(out_dir, stem + ".png"))


if __name__ == "__main__":
    main()
