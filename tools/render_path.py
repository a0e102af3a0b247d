#!/usr/bin/env python3
"""Render a novel camera path (no ground truth) from a trained run.

The reference's RaysFromCamerasDataset capability
(datasets/rays_from_cameras_dataset.py) as a CLI: build a circle /
circle-on-sphere / sphere camera path, render every view through the run's
weights, write PNGs + a GIF.

Usage:
  python tools/render_path.py --run_dir runs/<run> --camera_path circle \
      --number_steps 30 --camera_radius 2.4 --resolution 128 --out renders_path
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--camera_path", default="circle",
                   choices=["circle", "sphere", "circle_on_sphere"])
    p.add_argument("--number_steps", type=int, default=30)
    p.add_argument("--camera_radius", type=float, default=2.4)
    p.add_argument("--start_angle", type=float, default=-90)
    p.add_argument("--end_angle", type=float, default=90)
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--human_pose_angle", type=float, default=0.0,
                   help="arm angle (deg) written into the varied joints for "
                        "pose-conditioned models")
    p.add_argument("--fast", type=int, default=0,
                   help="1: foreground-culled hierarchical renderer "
                        "(render/fast.py) — exact for zero-weight background "
                        "rays, ~2x faster on mostly-background scenes; "
                        "2: occupancy-grid culled — cull scores come from a "
                        "baked density voxel grid, no coarse MLP on "
                        "background rays at all")
    p.add_argument("--cap_fraction", type=float, default=0.0,
                   help="--fast: fraction of rays fine-rendered (top opacity)."
                        " <=0: derive from occupancy probe counts (fast=2) or"
                        " use 0.25 (fast=1)")
    p.add_argument("--out", default="renders_path")
    args = p.parse_args()

    from smpl_nerf_tpu.cli.inference import (render_dataset, save_rerenders,
                                             setup_from_run_dir)
    from smpl_nerf_tpu.core import cameras
    from smpl_nerf_tpu.data import datasets

    run_args, extras, _ = setup_from_run_dir(args.run_dir)
    if args.camera_path == "circle":
        cams, _ = cameras.get_circle_poses(args.start_angle, args.end_angle,
                                           args.number_steps, args.camera_radius)
    elif args.camera_path == "sphere":
        cams, _ = cameras.get_sphere_poses(args.start_angle, args.end_angle,
                                           int(np.sqrt(args.number_steps)) or 1,
                                           args.camera_radius)
    else:
        cams, _ = cameras.get_circle_on_sphere_poses(args.number_steps, 10.0,
                                                     args.camera_radius)
    data = datasets.rays_from_cameras(cams, args.resolution, args.resolution,
                                      np.pi / 3)
    if run_args.model_type not in ("nerf", "original_nerf"):
        pose = np.zeros((data.num_images, 69), np.float32)
        for j in run_args.human_joints:
            pose[:, int(j)] = np.deg2rad(args.human_pose_angle)
        data.human_poses = pose
        data.betas = np.zeros(10, np.float32)
    renders = render_dataset(run_args, extras, args.run_dir, data,
                             fast=int(args.fast), cap_fraction=args.cap_fraction)
    save_rerenders(renders, args.out)
    print(f"{data.num_images} novel views -> {args.out}")


if __name__ == "__main__":
    main()
