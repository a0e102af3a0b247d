#!/usr/bin/env python3
"""Loss-landscape probe for analysis-by-synthesis pose optimization.

Sweeps the two arm-angle scalars (joints 38/41, the dims
DummyImageWiseEstimator trains) through a frozen coarse NeRF and reports the
photometric loss at each angle — the probe RESULTS.md cites for the
image_wise_dynamic minimum's location/sharpness, committed as a rerunnable
tool (VERDICT round-3 item 3b). Mirrors the loss of
/root/reference/solver/image_wise_solver.py:89-121 via
training/image_wise.make_pose_loss.

Usage:
  python tools/pose_landscape.py --run_dir runs/<image_wise_run> \
      --dataset_dir data/arm25_256/train --angles -10 60 36 --rays 8192
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True,
                    help="completed image_wise_dynamic run (frozen coarse NeRF)")
    ap.add_argument("--dataset_dir", required=True,
                    help="split dir rendered at the GOAL pose")
    ap.add_argument("--angles", nargs=3, type=float, default=(-10.0, 60.0, 36),
                    metavar=("START", "END", "STEPS"), help="degrees")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from smpl_nerf_tpu.cli.inference import setup_from_run_dir
    from smpl_nerf_tpu.core.sampling import coarse_bins
    from smpl_nerf_tpu.data import datasets
    from smpl_nerf_tpu.pipelines import RenderConfig
    from smpl_nerf_tpu.training import checkpoints
    from smpl_nerf_tpu.training.factory import build_models_and_params
    from smpl_nerf_tpu.training.image_wise import make_pose_loss

    run_args, extras, _ = setup_from_run_dir(args.run_dir)
    data = datasets.load_dataset(args.dataset_dir, run_args.model_type, run_args)
    extras = dict(extras)
    extras["num_images"] = data.num_images
    extras["betas"] = (data.betas if data.betas is not None
                       else np.zeros(10, np.float32))
    if data.human_poses is not None:
        extras["goal_poses"] = data.human_poses
    extras.setdefault("canonical_pose", np.zeros(69, np.float32))
    extras.setdefault("ground_truth_pose",
                      data.human_poses[0] if data.human_poses is not None
                      else np.zeros(69, np.float32))
    models, params, encoders = build_models_and_params(
        run_args, jax.random.PRNGKey(0), extras)
    params = checkpoints.load_run(args.run_dir, params)

    cfg = RenderConfig.from_args(run_args)
    smpl_model = extras["smpl_model"]
    betas = jnp.asarray(extras["betas"], jnp.float32).reshape(-1)
    pose_loss = jax.jit(make_pose_loss(smpl_model, betas, cfg,
                                       models["model_coarse"],
                                       encoders["position"],
                                       encoders["direction"]))

    # deterministic strided ray subset + mid-bin z values
    n = data.num_rays
    idx = np.linspace(0, n - 1, min(args.rays, n)).astype(np.int64)
    origins = jnp.asarray(data.origins[idx])
    dirs = jnp.asarray(data.directions[idx])
    rgb = jnp.asarray(data.rgb[idx])
    S = int(run_args.number_coarse_samples)
    base = np.asarray(coarse_bins(float(run_args.near), float(run_args.far), S))
    mids = 0.5 * (base[1:] + base[:-1])
    z = jnp.broadcast_to(jnp.asarray(
        np.concatenate([mids, base[-1:]]).astype(np.float32)),
        (len(idx), S))

    gt = extras["ground_truth_pose"]
    print(f"ground-truth arm angles: {np.rad2deg(gt[38]):.1f} / "
          f"{np.rad2deg(gt[41]):.1f} deg; probing {len(idx)} rays")
    start, end, steps = args.angles
    rows = []
    for a in np.linspace(start, end, int(steps)):
        pose = np.zeros(69, np.float32)
        pose[38] = pose[41] = np.deg2rad(a)
        loss = float(pose_loss(params["model_coarse"], jnp.asarray(pose),
                               origins, dirs, z, rgb))
        rows.append({"angle_deg": round(float(a), 3), "loss": loss})
        print(f"angle {a:7.2f} deg  loss {loss:.6f}")
    best = min(rows, key=lambda r: r["loss"])
    print(f"minimum at {best['angle_deg']} deg (loss {best['loss']:.6f})")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"gt_deg": [float(np.rad2deg(gt[38])),
                                  float(np.rad2deg(gt[41]))],
                       "landscape": rows}, fh, indent=1)
        print("landscape ->", args.out)


if __name__ == "__main__":
    main()
