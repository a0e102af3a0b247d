"""Distill a TRAINED run into a KiloNeRF-style expert grid and measure it.

The reference's only inference path evaluates its single W=256 trunk on every
sample of every ray (/root/reference/inference.py:247-254). This tool converts
a trained static-scene run into a grid^3 field of tiny MLPs
(render/experts.py, arXiv:2103.13744) and measures, on the same val split:

  * distilled quality vs ground truth (PSNR/SSIM/rlpips),
  * the distillation gap: distilled render vs the TEACHER rendered with the
    IDENTICAL uniform-z integration (isolates the field swap from sampling),
  * render latency, teacher-trunk vs distilled-experts, same chunking, same
    sample count, best-of-N with host-synced timing (the axon tunnel makes
    block_until_ready a no-op — timing must round-trip bytes).

Static families only (nerf/original_nerf): distillation bakes the field, so a
pose-conditioned family would need one expert grid per pose — the same
per-pose baking contract as render/fast.make_occupancy_renderer.

Usage:
  python tools/distill_run.py --run_dir runs/<run>/best \
      --dataset_dir data/canonical_256/val --out_dir runs/distill_canonical \
      --grid 16 --hidden 32 --steps 3000

Writes <out_dir>/scores.json (quality + latency + config) and field.npz.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.cli.inference import setup_from_run_dir
from smpl_nerf_tpu.core.integrate import raw2outputs
from smpl_nerf_tpu.data import datasets
from smpl_nerf_tpu.evaluation import print_scores
from smpl_nerf_tpu.pipelines import RenderConfig, _make_net_runner
from smpl_nerf_tpu.render import experts as ex
from smpl_nerf_tpu.training import checkpoints
from smpl_nerf_tpu.training.factory import build_models_and_params


def build_teacher(run_dir: str):
    """(teacher_fn, cfg, args) from a trained static-scene run dir."""
    args, extras, _ = setup_from_run_dir(run_dir)
    if args.model_type not in ("nerf", "original_nerf"):
        raise ValueError(
            f"distillation bakes a static field; model_type={args.model_type} "
            "is pose-conditioned (one grid per pose would be needed, like the "
            "occupancy baker)")
    models, params, encoders = build_models_and_params(
        args, jax.random.PRNGKey(0), extras)
    params = checkpoints.load_run(run_dir, params)
    cfg = RenderConfig.from_args(args)
    run = _make_net_runner(cfg, models, encoders)
    model_key = "model_fine" if cfg.run_fine else "model_coarse"

    def teacher_fn(pos, dirs):
        raw = run(model_key, params, pos[:, None, :], dirs[:, None, :])
        return raw.reshape(pos.shape[0], -1)

    return teacher_fn, cfg, args


def probe_aabb(teacher_fn, data, near, far, res=64, sigma_thresh=5.0):
    """Tight scene AABB: probe teacher density on a res^3 grid spanning the
    ray extents; return the occupied cells' bounds + one probe-cell margin."""
    ends = np.concatenate([data.origins + near * data.directions,
                           data.origins + far * data.directions])
    lo, hi = ends.min(0), ends.max(0)
    axes = [np.linspace(lo[i], hi[i], res, dtype=np.float32) for i in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    dirs = np.tile(np.float32([[0, 0, 1]]), (pts.shape[0], 1))
    sig = []
    probe = jax.jit(lambda p, d: teacher_fn(p, d)[:, 3])
    for i in range(0, len(pts), 65536):
        sig.append(np.asarray(probe(jnp.asarray(pts[i:i + 65536]),
                                    jnp.asarray(dirs[i:i + 65536]))))
    sigma = np.maximum(np.concatenate(sig), 0.0)
    occ = pts[sigma > sigma_thresh]
    if occ.shape[0] == 0:
        raise ValueError(f"no density above {sigma_thresh}; is the run trained?")
    cell = (hi - lo) / (res - 1)
    return occ.min(0) - cell, occ.max(0) + cell


def _image_rays(data, i):
    n = data.h * data.w
    sl = slice(i * n, (i + 1) * n)
    return data.origins[sl], data.directions[sl]


def max_bucket_count(data, aabb_min, aabb_max, grid, z, chunk):
    """Worst per-expert in-AABB sample count over every chunk this render
    will execute — sizes the static bucket capacity with no silent drops."""
    E = grid ** 3
    worst = 0
    z = np.asarray(z, np.float32)
    for i in range(data.num_images):
        o, d = _image_rays(data, i)
        for lo in range(0, len(o), chunk):
            pos = (o[lo:lo + chunk, None, :]
                   + z[None, :, None] * d[lo:lo + chunk, None, :]).reshape(-1, 3)
            inside = np.all((pos >= aabb_min) & (pos <= aabb_max), -1)
            if not inside.any():
                continue
            u = (pos[inside] - aabb_min) / (aabb_max - aabb_min)
            c = np.clip((u * grid).astype(np.int64), 0, grid - 1)
            ids = (c[:, 0] * grid + c[:, 1]) * grid + c[:, 2]
            worst = max(worst, int(np.bincount(ids, minlength=E).max()))
    return worst


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--dataset_dir", required=True,
                   help="split dir with transforms.json (e.g. .../val)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--grid", type=int, default=16)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--l_pos", type=int, default=4)
    p.add_argument("--l_dir", type=int, default=2)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--samples", type=int, default=192,
                   help="uniform z samples per ray for BOTH renders")
    p.add_argument("--chunk", type=int, default=4096, help="rays per chunk")
    p.add_argument("--images", type=int, default=0, help="cap val images (0=all)")
    p.add_argument("--time_reps", type=int, default=5)
    p.add_argument("--sigma_thresh", type=float, default=5.0)
    p.add_argument("--probe_res", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    teacher_fn, cfg, run_args = build_teacher(args.run_dir)
    data = datasets.load_dataset(args.dataset_dir, "nerf", run_args)
    if args.images:
        n = args.images * data.h * data.w
        data.origins = data.origins[:n]
        data.directions = data.directions[:n]
        data.rgb = data.rgb[:n]
        data.image_indices = data.image_indices[:n]
        data.num_images = args.images

    t0 = time.time()
    aabb_min, aabb_max = probe_aabb(teacher_fn, data, cfg.near, cfg.far,
                                    args.probe_res, args.sigma_thresh)
    print(f"AABB {np.round(aabb_min, 3)} .. {np.round(aabb_max, 3)} "
          f"({time.time() - t0:.1f}s probe)")

    t0 = time.time()
    field, loss = ex.distill_experts(
        teacher_fn, aabb_min, aabb_max, args.grid, jax.random.PRNGKey(args.seed),
        hidden=args.hidden, l_pos=args.l_pos, l_dir=args.l_dir,
        n_steps=args.steps, batch=args.batch, lr=args.lr)
    distill_s = time.time() - t0
    print(f"distilled grid={args.grid}^3 hidden={args.hidden} in "
          f"{distill_s:.1f}s, final normalized mse {loss:.4f}")
    np.savez(os.path.join(args.out_dir, "field.npz"),
             **{k: np.asarray(v) for k, v in field.experts._asdict().items()},
             aabb_min=np.asarray(aabb_min), aabb_max=np.asarray(aabb_max),
             grid=args.grid, l_pos=args.l_pos, l_dir=args.l_dir)

    S = args.samples
    z_row = np.linspace(cfg.near, cfg.far, S, dtype=np.float32)
    capacity = max_bucket_count(data, np.asarray(aabb_min), np.asarray(aabb_max),
                                args.grid, z_row, args.chunk)
    capacity = int(np.ceil(capacity * 1.02 / 64) * 64)
    print(f"bucket capacity = {capacity} "
          f"(chunk {args.chunk} rays x {S} samples)")

    white = bool(getattr(run_args, "white_background", 0))

    @jax.jit
    def render_teacher(o, d):
        z = jnp.broadcast_to(jnp.asarray(z_row), (o.shape[0], S))
        pos = o[:, None, :] + z[..., None] * d[:, None, :]
        raw = teacher_fn(pos.reshape(-1, 3),
                         jnp.broadcast_to(d[:, None, :], pos.shape).reshape(-1, 3))
        return raw2outputs(raw.reshape(-1, S, 4), z, d,
                           white_background=white).rgb

    @jax.jit
    def render_expert(o, d):
        z = jnp.broadcast_to(jnp.asarray(z_row), (o.shape[0], S))
        outs, n_over = ex.render_rays_with_experts_bucketed(
            field, o, d, z, capacity, white_background=white)
        return outs.rgb, n_over

    def render_split(fn, expert):
        imgs, total_over = [], 0
        for i in range(data.num_images):
            o, d = _image_rays(data, i)
            rows = []
            for lo in range(0, len(o), args.chunk):
                out = fn(jnp.asarray(o[lo:lo + args.chunk]),
                         jnp.asarray(d[lo:lo + args.chunk]))
                if expert:
                    out, n_over = out
                    total_over += int(n_over)
                rows.append(np.asarray(out))
            imgs.append(np.concatenate(rows).reshape(data.h, data.w, 3))
        return np.stack(imgs), total_over

    truths = data.rgb.reshape(data.num_images, data.h, data.w, 3)
    print("— teacher render (identical uniform-z integration) —")
    teach_imgs, _ = render_split(render_teacher, False)
    teacher_scores = print_scores(teach_imgs, truths)
    print("— distilled render —")
    dist_imgs, n_over = render_split(render_expert, True)
    if n_over:
        raise RuntimeError(f"{n_over} samples overflowed capacity {capacity} "
                           "— raise --chunk granularity or capacity")
    dist_scores = print_scores(dist_imgs, truths)
    print("— distillation gap (distilled vs teacher, same integration) —")
    gap_scores = print_scores(dist_imgs, teach_imgs)

    # latency, one full image through the same chunking, best-of-N; the sync
    # is the np.asarray round-trip inside render_split-style loops
    def time_image(fn, expert):
        o, d = _image_rays(data, 0)
        best = np.inf
        for _ in range(args.time_reps):
            t0 = time.time()
            for lo in range(0, len(o), args.chunk):
                out = fn(jnp.asarray(o[lo:lo + args.chunk]),
                         jnp.asarray(d[lo:lo + args.chunk]))
                np.asarray(out[0] if expert else out)
            best = min(best, time.time() - t0)
        return best

    t_teacher = time_image(render_teacher, False)
    t_expert = time_image(render_expert, True)
    print(f"render latency ({data.h}x{data.w}, {S} samples/ray, best of "
          f"{args.time_reps}): teacher {t_teacher * 1e3:.1f} ms, distilled "
          f"{t_expert * 1e3:.1f} ms ({t_teacher / t_expert:.1f}x)")

    out = {
        "run_dir": args.run_dir, "dataset_dir": args.dataset_dir,
        "grid": args.grid, "hidden": args.hidden, "steps": args.steps,
        "samples": S, "chunk": args.chunk, "capacity": capacity,
        "distill_seconds": round(distill_s, 1),
        "distill_final_mse": round(float(loss), 5),
        "teacher": teacher_scores, "distilled": dist_scores,
        "distill_gap": gap_scores,
        "latency_ms": {"teacher": round(t_teacher * 1e3, 2),
                       "distilled": round(t_expert * 1e3, 2),
                       "speedup": round(t_teacher / t_expert, 2)},
    }
    with open(os.path.join(args.out_dir, "scores.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", os.path.join(args.out_dir, "scores.json"))
    return out


if __name__ == "__main__":
    main()
