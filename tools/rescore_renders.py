#!/usr/bin/env python3
"""Re-score persisted renders against their ground truth — CPU-friendly.

inference.py / run_baselines.py / pix2pix_baseline.py persist img_NNN.png
renders and a scores.json next to them. This tool recomputes metrics from
those files, adding any metric that did not exist when the renders were made
(round 3: `rlpips`, the untrained-VGG perceptual distance — see
evaluation/scores.rlpips) without touching the TPU or re-rendering.

Modes:
  * --scan runs           walk runs/*/renders_val*/scores.json; whenever the
                          recorded ground_truth_dir still exists, recompute
                          and merge missing metrics (--force recomputes all).
  * --renders_dir/--ground_truth_dir   one explicit pair (e.g. a baseline dir
                          whose scores.json predates the ground_truth_dir
                          field).

Renders on disk are RGB PNGs (save_rerenders flips the pipeline's BGR);
ground truth is loaded through the same dataset loader inference.py uses, so
channel order is aligned by flipping the PNGs back to BGR.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import argparse
import glob
import json

import numpy as np


def load_renders(renders_dir: str) -> np.ndarray:
    import imageio.v2 as imageio
    paths = sorted(glob.glob(os.path.join(renders_dir, "img_*.png")))
    if not paths:
        raise FileNotFoundError(f"no img_*.png under {renders_dir}")
    imgs = np.stack([imageio.imread(p) for p in paths])
    return imgs[..., ::-1].astype(np.float32) / 255.0  # RGB files -> BGR


def load_truths(ground_truth_dir: str, model_type: str = "smpl_nerf") -> np.ndarray:
    if model_type == "pix2pix":
        # p2p datasets are (RGB, depth) pairs; flip to the BGR convention the
        # other loaders use so both sides of the comparison match
        from tools.pix2pix_baseline import load_pairs
        rgb, _ = load_pairs(ground_truth_dir)
        return np.asarray(rgb)[..., ::-1]
    from smpl_nerf_tpu.data import datasets
    data = datasets.load_dataset(ground_truth_dir, model_type)
    return np.asarray(data.rgb).reshape(data.num_images, data.h, data.w, 3)


def rescore(renders_dir: str, ground_truth_dir: str, model_type: str,
            force: bool = False, update: bool = True) -> dict:
    from smpl_nerf_tpu.evaluation import print_scores
    scores_path = os.path.join(renders_dir, "scores.json")
    old = json.load(open(scores_path)) if os.path.exists(scores_path) else {}
    renders = load_renders(renders_dir)
    truths = load_truths(ground_truth_dir, model_type)
    if len(renders) != len(truths):
        raise ValueError(f"{renders_dir}: {len(renders)} renders vs "
                         f"{len(truths)} ground-truth images")
    print(f"-- {renders_dir} vs {ground_truth_dir} ({len(renders)} images)")
    fresh = print_scores(renders, truths)
    # PSNR recomputed from 8-bit files drifts ~0.01 dB vs the original f32
    # scores; keep originals unless --force, only ADD missing metrics.
    merged = {**fresh, **old} if not force else {**old, **fresh}
    merged.setdefault("ground_truth_dir", ground_truth_dir)
    if update:
        with open(scores_path, "w") as fh:
            json.dump(merged, fh, indent=1)
    return merged


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", default=None, help="runs dir to walk")
    ap.add_argument("--match", default="", help="substring filter for --scan")
    ap.add_argument("--renders_dir", default=None)
    ap.add_argument("--ground_truth_dir", default=None)
    ap.add_argument("--model_type", default="smpl_nerf")
    ap.add_argument("--force", action="store_true",
                    help="overwrite existing metrics instead of only adding")
    ap.add_argument("--dry_run", action="store_true")
    args = ap.parse_args()

    if args.renders_dir:
        if not args.ground_truth_dir:
            sc = json.load(open(os.path.join(args.renders_dir, "scores.json")))
            args.ground_truth_dir = sc["ground_truth_dir"]
        rescore(args.renders_dir, args.ground_truth_dir, args.model_type,
                args.force, update=not args.dry_run)
        return
    if not args.scan:
        ap.error("need --scan or --renders_dir")
    for scores_path in sorted(
            glob.glob(os.path.join(args.scan, "*", "renders_val*", "scores.json"))
            + glob.glob(os.path.join(args.scan, "*", "scores.json"))):
        run = os.path.relpath(scores_path, args.scan)
        if args.match not in run:
            continue
        sc = json.load(open(scores_path))
        gt = sc.get("ground_truth_dir")
        renders_dir = os.path.dirname(scores_path)
        if not gt or not os.path.isdir(gt):
            print(f"-- {run}: no ground_truth_dir recorded/present — skipped "
                  "(use --renders_dir/--ground_truth_dir explicitly)")
            continue
        if "rlpips" in sc and not args.force:
            print(f"-- {run}: rlpips already present — skipped")
            continue
        try:
            rescore(renders_dir, gt, args.model_type, args.force,
                    update=not args.dry_run)
        except (ValueError, FileNotFoundError) as e:
            print(f"-- {run}: {e}")


if __name__ == "__main__":
    main()
