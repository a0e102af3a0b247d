"""Synthetic dataset generation (the create_dataset.py capability).

Mirrors the reference generator (/root/reference/create_dataset.py:138-242):
camera paths sphere / circle / circle_on_sphere, human joint-angle sweeps or
AMASS pose sequences, multi_human_pose / frames_per_view combinatorics, random
disjoint train/val split, PNG images + per-split transforms.json + a resolved
create_dataset_config.txt. Output is byte-compatible with the reference's
dataset contract so either framework can train on it.

Rendering runs on the JAX ray tracer (render/raytrace.py) with the built-in
procedural human by default, or real SMPL geometry + SURREAL texture when the
user supplies the licensed pkl (--smpl_model_path) — the reference hard-requires
the pkl (render.py:47) and pyrender/GL; this needs neither.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from smpl_nerf_tpu.core import cameras
from smpl_nerf_tpu.models import smpl as smpl_mod
from smpl_nerf_tpu.render import raytrace


def disjoint_indices(size: int, ratio: float, random: bool = True):
    """Random disjoint index split — reference utils.py:292-309."""
    indices = np.arange(size)
    if random:
        np.random.shuffle(indices)
    split = int(size * ratio)
    return indices[:split], indices[split:]


def load_pose_sequence(path: str, start: int = 0, end: int = -1, skip: int = 1):
    """AMASS .npz -> [n_frames, 1, 69] body poses (+ global orients).

    Mirrors util/smpl_sequence_loading.py:7-60: AMASS 'poses' store 156-dim
    SMPL-H; dims 3:66 are the 21 body joints -> first 63 of the 69-dim SMPL
    body pose (hands stay zero); dims 0:3 are the global root orientation.
    """
    data = np.load(path)
    poses = np.asarray(data["poses"], np.float32)
    body = np.zeros((len(poses), 1, 69), np.float32)
    body[:, 0, :63] = poses[:, 3:66]
    orients = poses[:, None, 0:3].astype(np.float32)
    sl = slice(start, None if end == -1 else end, skip)
    return body[sl], orients[sl]


def _camera_transforms(args):
    if args.camera_path == "sphere":
        return cameras.get_sphere_poses(args.start_angle, args.end_angle,
                                        args.number_steps, args.camera_radius)[0]
    if args.camera_path == "circle":
        return cameras.get_circle_poses(args.start_angle, args.end_angle,
                                        args.number_steps, args.camera_radius)[0]
    if args.camera_path == "circle_on_sphere":
        return cameras.get_circle_on_sphere_poses(
            args.number_steps, args.circle_on_sphere_radius, args.camera_radius,
            args.center_theta, args.center_phi)[0]
    raise ValueError(f"unknown camera path {args.camera_path}")


def _load_texture(path: Optional[str]):
    if path is None:
        return None
    import cv2
    img = cv2.imread(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def save_split(save_dir: str, split: str, model: smpl_mod.SmplModel,
               camera_transforms: np.ndarray, indices, resolution: int,
               camera_angle_x: float, far: float, dataset_type: str,
               human_poses: Optional[np.ndarray], betas: np.ndarray,
               expression: np.ndarray, texture: Optional[np.ndarray] = None,
               supersample: int = 1):
    """Render and write one split. Mirrors reference save_split (create_dataset.py:67-135)."""
    import jax.numpy as jnp

    if dataset_type not in ("nerf", "pix2pix", "smpl_nerf", "smpl"):
        raise Exception("This dataset type is unknown")
    directory = os.path.join(save_dir, split)
    os.makedirs(directory, exist_ok=True)
    indices = list(indices)
    cams = camera_transforms[indices]
    image_names = [f"img_{i:03d}.png" for i in indices]
    h = w = resolution
    image_transform_map = {name: cam.tolist() for name, cam in zip(image_names, cams)}

    meta = {"camera_angle_x": camera_angle_x, "image_transform_map": image_transform_map}
    if dataset_type in ("smpl_nerf", "smpl", "pix2pix"):
        poses = human_poses[indices]
        meta["image_pose_map"] = {name: pose.reshape(-1).tolist()
                                  for name, pose in zip(image_names, poses)}
        meta["betas"] = np.asarray(betas).reshape(-1).tolist()
        meta["expression"] = np.asarray(expression).reshape(-1).tolist()

    canonical_verts = np.asarray(smpl_mod.smpl_forward(
        model, jnp.asarray(betas).reshape(-1), jnp.zeros(69)))

    ss = max(1, int(supersample))
    if ss > 1 and dataset_type == "smpl":
        # the smpl type's per-pixel depth/warp companions are center-ray
        # quantities; averaging RGB across subpixels would decouple them
        print("supersample ignored for dataset_type=smpl (center-ray "
              "warp/depth companions must match the RGB ray exactly)")
        ss = 1

    def _downsample(img_hi: np.ndarray) -> np.ndarray:
        """Box-average ss x ss subpixels -> [h, w, C] uint8 (anti-aliasing)."""
        hi = img_hi.astype(np.float32).reshape(h, ss, w, ss, -1).mean((1, 3))
        return np.clip(np.rint(hi), 0, 255).astype(np.uint8)

    import cv2
    for k, (name, cam) in enumerate(zip(image_names, cams)):
        if dataset_type == "nerf":
            verts = canonical_verts
        else:
            pose = human_poses[indices[k]].reshape(-1)
            verts = np.asarray(smpl_mod.smpl_forward(
                model, jnp.asarray(betas).reshape(-1), jnp.asarray(pose)))
        render_kwargs = dict(vertex_colors=model.vertex_colors)
        if texture is not None and model.uv is not None:
            render_kwargs = dict(uv=model.uv, texture=texture)
        if dataset_type == "pix2pix":
            img, depth = raytrace.render_scene(verts, model.faces, cam,
                                               h * ss, w * ss,
                                               camera_angle_x, return_depth=True,
                                               **render_kwargs)
            depth_vis = (np.clip(depth / far, 0, 1) * 255).astype(np.uint8)
            if ss > 1:
                img = _downsample(img)
                depth_vis = _downsample(depth_vis[..., None])[..., 0]
            img = np.concatenate([img, np.repeat(depth_vis[..., None], 3, -1)], 1)
        elif dataset_type == "smpl":
            img, depth = raytrace.render_scene(verts, model.faces, cam, h, w,
                                               camera_angle_x, return_depth=True,
                                               **render_kwargs)
            warp, depth_w = raytrace.get_warp(canonical_verts, verts, model.faces,
                                              cam, h, w, camera_angle_x)
            stem = f"{indices[k]:03d}"
            np.save(os.path.join(directory, f"warp_{stem}.npy"), warp)
            np.save(os.path.join(directory, f"depth_{stem}.npy"), depth_w)
        else:
            img = raytrace.render_scene(verts, model.faces, cam, h * ss, w * ss,
                                        camera_angle_x, **render_kwargs)
            if ss > 1:
                img = _downsample(img)
        cv2.imwrite(os.path.join(directory, name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    with open(os.path.join(directory, "transforms.json"), "w") as fh:
        json.dump(meta, fh)
    print(f"Saved {len(image_names)} {split} images under {directory}")


def create_dataset(args, parser=None):
    """Main generator — mirrors reference create_dataset (create_dataset.py:138-242)."""
    np.random.seed(int(getattr(args, "seed", 0)))
    camera_angle_x = np.pi / 3
    human_poses = None

    if args.camera_path == "sphere":
        dataset_size = camera_number_steps = args.number_steps ** 2
    elif args.camera_path in ("circle", "circle_on_sphere"):
        dataset_size = camera_number_steps = args.number_steps
    else:
        raise Exception("This camera path is unknown")

    if args.smpl_sequence_file is not None:
        human_poses, _ = load_pose_sequence(args.smpl_sequence_file,
                                            args.sequence_start, args.sequence_end,
                                            args.sequence_skip)
        args.human_number_steps = len(human_poses)
        dataset_size = (dataset_size * args.human_number_steps
                        if args.multi_human_pose else len(human_poses))
    elif args.dataset_type in ("smpl_nerf", "smpl", "pix2pix"):
        if args.multi_human_pose:
            dataset_size = dataset_size * args.human_number_steps
        elif args.frames_per_view:
            dataset_size = args.human_number_steps
    far = args.camera_radius * 2

    camera_transforms = _camera_transforms(args)
    if args.dataset_type in ("smpl_nerf", "smpl", "pix2pix") and args.smpl_sequence_file is None:
        joints = [int(j) for j in args.joints]
        if args.multi_human_pose:
            human_poses = smpl_mod.get_human_poses(joints, args.human_start_angle,
                                                   args.human_end_angle,
                                                   args.human_number_steps)
            human_poses = np.tile(human_poses, (camera_number_steps, 1, 1))
            camera_transforms = np.repeat(camera_transforms, args.human_number_steps, axis=0)
        else:
            human_poses = smpl_mod.get_human_poses(joints, args.human_start_angle,
                                                   args.human_end_angle, dataset_size)
            if args.frames_per_view:
                reps = int(np.ceil(args.human_number_steps / camera_number_steps))
                camera_transforms = np.repeat(camera_transforms, reps, axis=0)
    elif args.smpl_sequence_file is not None:
        if args.multi_human_pose:
            human_poses = np.tile(human_poses, (camera_number_steps, 1, 1))
            camera_transforms = np.repeat(camera_transforms, args.human_number_steps, axis=0)
        else:
            reps = int(np.ceil(args.human_number_steps / camera_number_steps))
            if args.frames_per_view == 1:
                camera_transforms = np.concatenate([camera_transforms] * reps, axis=0)
            else:
                camera_transforms = np.repeat(camera_transforms, reps, axis=0)

    # body model: licensed SMPL pkl if provided, else the procedural human
    smpl_path = getattr(args, "smpl_model_path", None)
    texture = None
    if smpl_path and os.path.exists(smpl_path):
        model = smpl_mod.load_smpl_pkl(smpl_path)
        texture = _load_texture(getattr(args, "texture_path", None))
        betas = smpl_mod.default_betas()
        expression = smpl_mod.default_expression()
    else:
        model = smpl_mod.procedural_human()
        betas = np.zeros((1, 10), np.float32)
        expression = np.zeros((1, 10), np.float32)

    train_indices, val_indices = disjoint_indices(dataset_size, args.train_val_ratio)
    train_indices, val_indices = sorted(train_indices), sorted(val_indices)
    for split, indices in (("train", train_indices), ("val", val_indices)):
        save_split(args.save_dir, split, model, camera_transforms, indices,
                   args.resolution, camera_angle_x, far, args.dataset_type,
                   human_poses, betas, expression, texture,
                   supersample=int(getattr(args, "supersample", 1) or 1))
    args.train_index = list(map(int, train_indices))
    args.val_index = list(map(int, val_indices))
    if parser is not None:
        parser.write_config_file(
            args, [os.path.join(args.save_dir, "create_dataset_config.txt")])
    return train_indices, val_indices
