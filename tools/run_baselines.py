#!/usr/bin/env python3
"""Score the nearest-neighbor baseline on a dataset's val split.

The paper's Table 1 (BASELINE.md) compares SMPL-NeRF against baselines; the
reference ships a nearest-training-image baseline
(/root/reference/legacy/nearest_neighbors.py) which is the cheapest lower
bound any learned model must beat. This renders the val split by
nearest-(camera, pose) training image, prints MSE/PSNR/SSIM, and saves the
renders so evaluate_pix2pix.py can build side-by-side comparisons.

Usage:
  python tools/run_baselines.py --dataset_dir data/walking_256_aa \
      --out runs/baseline_nn_walking
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_dir", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--pose_weight", type=float, default=1.0)
    args = ap.parse_args()

    from smpl_nerf_tpu.baselines.nearest_neighbors import (
        evaluate_nearest_neighbors)
    from smpl_nerf_tpu.cli.inference import save_rerenders
    from smpl_nerf_tpu.data import datasets

    train = datasets.load_dataset(os.path.join(args.dataset_dir, "train"),
                                  "smpl_nerf")
    val = datasets.load_dataset(os.path.join(args.dataset_dir, "val"),
                                "smpl_nerf")
    renders, scores = evaluate_nearest_neighbors(train, val, args.pose_weight)
    if args.out:
        save_rerenders(renders, args.out)
        with open(os.path.join(args.out, "scores.json"), "w") as fh:
            json.dump(scores, fh, indent=1)
        print("NN baseline renders + scores ->", args.out)


if __name__ == "__main__":
    main()
