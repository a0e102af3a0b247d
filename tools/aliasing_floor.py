#!/usr/bin/env python3
"""Measure a dataset's aliasing PSNR floor.

Ground truth rendered at 1 ray/pixel has jagged silhouettes and stripe moire
that a smooth radiance field cannot reproduce; the achievable val PSNR is
therefore bounded by PSNR(GT, anti-aliased render of the SAME scene). This
renders each sampled GT view with NxN supersampling and reports that bound —
the honest ceiling to compare training curves against (e.g. the paper's 36.7
avg PSNR is only reachable on GT whose own floor is above it).

Usage:
  JAX_PLATFORMS=cpu python tools/aliasing_floor.py --dataset_dir data/walking_256/val \
      [--frames 3] [--supersample 2]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", required=True,
                   help="a split dir containing transforms.json")
    p.add_argument("--frames", type=int, default=3,
                   help="number of evenly spaced views to measure")
    p.add_argument("--supersample", type=int, default=2)
    args = p.parse_args()

    import cv2
    import jax.numpy as jnp

    from smpl_nerf_tpu.models import smpl as smpl_mod
    from smpl_nerf_tpu.render import raytrace

    meta = json.load(open(os.path.join(args.dataset_dir, "transforms.json")))
    names = sorted(meta["image_transform_map"])
    names = [names[i] for i in
             np.linspace(0, len(names) - 1, args.frames).astype(int)]
    camera_angle_x = float(meta.get("camera_angle_x", np.pi / 3))

    # resolve the body model / texture the generator used (mirrors
    # data/generate.create_dataset's smpl_model_path / texture_path handling)
    model, render_kwargs = smpl_mod.procedural_human(), {}
    cfg_path = os.path.join(os.path.dirname(args.dataset_dir.rstrip("/")),
                            "create_dataset_config.txt")
    gen_cfg = {}
    if os.path.exists(cfg_path):
        for line in open(cfg_path):
            if "=" in line:
                k, _, v = line.partition("=")
                gen_cfg[k.strip()] = v.strip()
    smpl_path = gen_cfg.get("smpl_model_path", "")
    if smpl_path and smpl_path != "None" and os.path.exists(smpl_path):
        model = smpl_mod.load_smpl_pkl(smpl_path)
        tex_path = gen_cfg.get("texture_path", "")
        if tex_path and tex_path != "None" and os.path.exists(tex_path):
            tex = cv2.cvtColor(cv2.imread(tex_path), cv2.COLOR_BGR2RGB)
            render_kwargs = dict(uv=model.uv, texture=tex)
    if not render_kwargs:
        render_kwargs = dict(vertex_colors=model.vertex_colors)

    betas = np.asarray(meta.get("betas", np.zeros(10)), np.float32)
    ss = int(args.supersample)
    psnrs = []
    for name in names:
        cam = np.asarray(meta["image_transform_map"][name], np.float32)
        pose = np.asarray(meta.get("image_pose_map", {}).get(
            name, np.zeros(69)), np.float32)
        verts = np.asarray(smpl_mod.smpl_forward(
            model, jnp.asarray(betas).reshape(-1), jnp.asarray(pose)))
        gt = cv2.imread(os.path.join(args.dataset_dir, name))
        gt = gt[:, :, ::-1].astype(np.float32) / 255
        h, w = gt.shape[:2]
        hi = raytrace.render_scene(verts, model.faces, cam, h * ss, w * ss,
                                   camera_angle_x, **render_kwargs)
        aa = hi.astype(np.float32).reshape(h, ss, w, ss, 3).mean((1, 3)) / 255
        mse = float(((aa - gt) ** 2).mean())
        psnrs.append(-10 * np.log10(mse))
        print(f"{name}: aliasing-floor PSNR {psnrs[-1]:.2f}")
    print(f"MEAN aliasing-floor PSNR over {len(names)} views: "
          f"{float(np.mean(psnrs)):.2f}")


if __name__ == "__main__":
    main()
