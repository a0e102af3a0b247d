#!/usr/bin/env python3
"""Measure full-image novel-view render latency at 256x256 from a trained run.

Compares the three production render paths on the SAME trained weights:
  naive (all rays through coarse+fine), fg-culled (render/fast.py),
  occupancy-grid culled (--fast 2). Run AFTER training finishes — single TPU
  process rule.

Usage: python scripts/measure_render_256.py runs/<run_dir> [resolution]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp


def main():
    run_dir = sys.argv[1]
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    from smpl_nerf_tpu.cli.inference import setup_from_run_dir
    from smpl_nerf_tpu.core import cameras
    from smpl_nerf_tpu.data import datasets
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.render.fast import (make_fast_renderer,
                                           make_occupancy_renderer)
    from smpl_nerf_tpu.training import checkpoints
    from smpl_nerf_tpu.training.factory import build_models_and_params

    args, extras, _ = setup_from_run_dir(run_dir)
    cams, _ = cameras.get_circle_poses(0, 30, 2, 2.4)
    data = datasets.rays_from_cameras(cams, res, res, np.pi / 3)
    if args.model_type not in ("nerf", "original_nerf"):
        data.human_poses = np.zeros((data.num_images, 69), np.float32)
        data.betas = np.zeros(10, np.float32)
    extras = dict(extras)
    extras["num_images"] = data.num_images
    extras["betas"] = data.betas if data.betas is not None else np.zeros(10)
    if data.human_poses is not None:
        extras["goal_poses"] = data.human_poses
    models, params, encoders = build_models_and_params(
        args, jax.random.PRNGKey(0), extras)
    params = checkpoints.load_run(run_dir, params)
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders,
                              extras)

    hw = res * res
    arrays = data.batch_arrays(args.model_type)
    batch = {k: jnp.asarray(v[:hw]) for k, v in arrays.items()
             if not k.endswith("_table") and k != "image_indices"}
    for k, v in arrays.items():
        if k.endswith("_table"):
            batch[k[:-len("_table")]] = jnp.broadcast_to(
                jnp.asarray(v[0]), (hw,) + np.asarray(v[0]).shape)

    def naive(p, b):
        return pipeline(p, b, None, False)["rgb_fine"]

    candidates = {
        "naive_all_rays": jax.jit(naive),
        "fg_culled": jax.jit(make_fast_renderer(pipeline, 0.25)),
        "occupancy": jax.jit(make_occupancy_renderer(pipeline, 0.25)),
    }
    occ = make_occupancy_renderer(pipeline, 0.25)
    grid = jax.jit(occ.build_grid)(params, batch)
    candidates["occupancy_prebaked"] = jax.jit(lambda p, b: occ(p, b, grid))

    for name, fn in candidates.items():
        np.asarray(fn(params, batch))  # compile + warm (host sync)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(params, batch))
            times.append(time.perf_counter() - t0)
        print(f"{res}x{res} {args.model_type} render [{name}]: "
              f"{min(times) * 1e3:.1f} ms (best of 5)")


if __name__ == "__main__":
    main()
