#!/usr/bin/env python3
"""Compare saved pix2pix baseline renders vs SMPL-NeRF renders vs ground truth.

Mirrors /root/reference/evaluate_pix2pix.py:12-70: loads three directories of
PNGs, prints MSE/PSNR/SSIM/LPIPS for each method against the ground truth, and
writes a side-by-side comparison GIF.

Usage:
  python evaluate_pix2pix.py --gt_dir data/val --nerf_dir renders_test \
      --pix2pix_dir pix2pix_results --out comparison.gif
"""
from __future__ import annotations

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import argparse
import glob
import os

import numpy as np


def load_images(directory: str) -> np.ndarray:
    import cv2
    paths = sorted(glob.glob(os.path.join(directory, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no PNGs in {directory}")
    imgs = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in paths]
    return np.stack(imgs).astype(np.float32) / 255.0


def plot_images_side_by_side(*image_stacks, labels=None, out_path="comparison.gif"):
    import imageio
    n = min(len(s) for s in image_stacks)
    frames = []
    for i in range(n):
        row = np.concatenate([np.clip(s[i], 0, 1) for s in image_stacks], axis=1)
        frames.append((row * 255).astype(np.uint8))
    imageio.mimsave(out_path, frames, fps=5)
    print(f"side-by-side GIF ({labels}) -> {out_path}")


def main():
    from smpl_nerf_tpu.evaluation import print_scores

    parser = argparse.ArgumentParser()
    parser.add_argument("--gt_dir", required=True)
    parser.add_argument("--nerf_dir", required=True)
    parser.add_argument("--pix2pix_dir", default=None)
    parser.add_argument("--out", default="comparison.gif")
    args = parser.parse_args()

    gt = load_images(args.gt_dir)
    nerf = load_images(args.nerf_dir)
    stacks = [gt, nerf]
    labels = ["ground truth", "smpl-nerf"]
    print("== SMPL-NeRF vs ground truth ==")
    print_scores(nerf[: len(gt)], gt[: len(nerf)])
    if args.pix2pix_dir:
        p2p = load_images(args.pix2pix_dir)
        # pix2pix renders may be [rgb | depth] side-by-side; crop the rgb half
        if p2p.shape[2] == 2 * gt.shape[2]:
            p2p = p2p[:, :, : gt.shape[2]]
        print("== pix2pix vs ground truth ==")
        print_scores(p2p[: len(gt)], gt[: len(p2p)])
        stacks.append(p2p)
        labels.append("pix2pix")
    plot_images_side_by_side(*stacks, labels=labels, out_path=args.out)


if __name__ == "__main__":
    main()
