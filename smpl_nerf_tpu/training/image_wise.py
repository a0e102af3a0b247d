"""Image-wise dynamic solver: pose optimization through a frozen NeRF.

The analysis-by-synthesis path (reference solver/image_wise_solver.py:15-261 +
datasets/image_wise_dataset.py): two trainable arm angles inside a
DummyImageWiseEstimator are optimized by gradient through LBS -> vertex
attention warp -> frozen coarse NeRF -> MSE against the image.

Per-image outer loop:
  1. z-vals for all of the image's rays from ray-mesh intersection against the
     mesh at the CURRENTLY estimated pose (reference recomputes this per epoch
     in Dataset.__getitem__ via trimesh, image_wise_dataset.py:106-138; here it
     is a jitted Möller–Trumbore query on device, stop-gradiented),
  2. canonical + goal LBS -> per-vertex warp (differentiable wrt pose),
  3. inner ray mini-batches: normalized-ReLU vertex attention warp
     (image_wise_solver.py:89-101 — NOT the modified softmax), frozen NeRF,
     MSE, Adam step at lrate_pose on the estimator only.

The reference's ImageWiseDataset bug (returning the LAST ray's z_vals for the
whole image, image_wise_dataset.py:154) is not reproduced. The reference's
`loss.backward(retain_graph=True)` hack disappears: each jitted step recomputes
the (cheap) LBS graph functionally.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smpl_nerf_tpu.core.integrate import raw2outputs
from smpl_nerf_tpu.core.sampling import coarse_bins
from smpl_nerf_tpu.models import smpl as smpl_mod
from smpl_nerf_tpu.ops import raymesh
from smpl_nerf_tpu.ops.vertex_attention import relu_attention_warp
from smpl_nerf_tpu.pipelines import RenderConfig
from smpl_nerf_tpu.training import checkpoints
from smpl_nerf_tpu.training.factory import build_models_and_params


def _z_vals_simple(args) -> np.ndarray:
    S = int(args.number_coarse_samples)
    base = np.asarray(coarse_bins(float(args.near), float(args.far), S))
    mids = 0.5 * (base[1:] + base[:-1])
    upper = np.concatenate([mids, base[-1:]])
    lower = np.concatenate([base[:1], mids])
    return (lower + (upper - lower) * np.random.rand()).astype(np.float32)


def make_pose_loss(smpl_model, betas, cfg, model_coarse, pos_enc, dir_enc):
    """photometric-loss(pose) through LBS -> vertex-attention warp -> NeRF.

    Shared by the training step (pose from the estimator) and the
    loss-landscape probe (tools/pose_landscape.py sweeps the pose directly).
    Mirrors reference image_wise_solver.py:89-121.
    """
    def pose_loss(coarse_params, pose, origins, dirs, z_vals, rgb_truth):
        canonical = smpl_mod.smpl_forward(smpl_model, betas, jnp.zeros(69))
        goal = smpl_mod.smpl_forward(smpl_model, betas, pose)
        warp_vec = canonical - goal
        samples = origins[:, None, :] + dirs[:, None, :] * z_vals[..., None]
        warp = relu_attention_warp(samples, goal, warp_vec, cfg.warp_radius)
        warped = samples + warp
        sample_dirs = warped - origins[:, None, :]
        dirs_norm = sample_dirs / jnp.linalg.norm(sample_dirs, axis=-1,
                                                  keepdims=True)
        R, S = samples.shape[:2]
        inputs = jnp.concatenate([pos_enc.encode(warped).reshape(R * S, -1),
                                  dir_enc.encode(dirs_norm).reshape(R * S, -1)], -1)
        raw = model_coarse.apply(coarse_params, inputs).reshape(R, S, 4)
        out = raw2outputs(raw, z_vals, sample_dirs, 0.0, cfg.white_background)
        return jnp.mean((out.rgb - rgb_truth) ** 2)

    return pose_loss


def train_image_wise(args, parser, train_data, val_data, extras,
                     log_dir: Optional[str] = None, writer=None):
    smpl_model = extras["smpl_model"]
    betas = jnp.asarray(extras["betas"], jnp.float32).reshape(-1)
    cfg = RenderConfig.from_args(args)
    rng = jax.random.PRNGKey(int(getattr(args, "seed", 0)))

    # ground truth pose (for error reporting) = first image's pose
    gt_pose = (train_data.human_poses[0] if train_data.human_poses is not None
               else np.zeros(69, np.float32))
    extras = dict(extras)
    extras.setdefault("canonical_pose", np.zeros(69, np.float32))
    extras["ground_truth_pose"] = gt_pose
    models, params, encoders = build_models_and_params(args, rng, extras)

    if args.load_coarse_model:
        if os.path.isdir(args.load_coarse_model):
            loaded = checkpoints.load_run(
                args.load_coarse_model, {"model_coarse": params["model_coarse"]})
        else:
            from flax import serialization
            with open(args.load_coarse_model, "rb") as fh:
                loaded = {"model_coarse": serialization.from_bytes(
                    jax.device_get(params["model_coarse"]), fh.read())}
        params["model_coarse"] = loaded["model_coarse"]
        print("Loaded frozen coarse model from", args.load_coarse_model)

    estimator = models["smpl_estimator"]
    pos_enc, dir_enc = encoders["position"], encoders["direction"]
    model_coarse = models["model_coarse"]
    faces = jnp.asarray(smpl_model.faces)

    @jax.jit
    def current_pose(est_params):
        return estimator.apply(est_params)[0]  # [69]

    @jax.jit
    def z_vals_for_image(est_params, origins, dirs, z_simple):
        """Intersection-driven z-vals against the currently-estimated mesh."""
        pose = current_pose(est_params)
        goal = smpl_mod.smpl_forward(smpl_model, betas, pose)
        dirs_unit = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        hits = raymesh.intersect_rays(origins, dirs_unit, goal, faces,
                                      chunk_size=min(1024, origins.shape[0]))
        S = int(args.number_coarse_samples)
        if S == 1:
            z = jnp.where(hits.hit, hits.t, float(args.far))[:, None]
        elif int(args.coarse_samples_from_intersect):
            std = float(args.std_dev_coarse_sample_prior)
            offs = jnp.linspace(-2.0 * std, 2.0 * std, S)
            z_int = hits.t[:, None] + offs[None, :]
            z = jnp.where(hits.hit[:, None], z_int, z_simple[None, :])
        else:
            z = jnp.broadcast_to(z_simple, (origins.shape[0], S))
        return jax.lax.stop_gradient(z)

    # reference freezes the NeRF only when a pretrained one is loaded
    # (train.py:253-259); otherwise ImageWiseSolver co-trains model_coarse at
    # the base lrate alongside the pose params (image_wise_solver.py:32-36)
    nerf_label = "frozen" if args.load_coarse_model else "net"
    pose_lr = float(args.lrate_pose)
    pose_decay_k = int(getattr(args, "lrate_pose_decay", 0) or 0)
    if pose_decay_k > 0:
        # same schedule as solver.make_optimizer: 0.1x over dk*1000 steps.
        # A constant lrate_pose reaches the basin floor but then orbits it
        # (RESULTS.md: 0.28deg/joint best at ep12, 0.6-4.6deg bounce after);
        # the decay pins the estimate at the floor.
        pose_lr = optax.exponential_decay(pose_lr, pose_decay_k * 1000, 0.1)
    tx = optax.multi_transform(
        {"pose": optax.adam(pose_lr),
         "net": optax.adam(float(args.lrate)),
         "frozen": optax.set_to_zero()},
        jax.tree_util.tree_map_with_path(
            lambda path, _: "pose" if (path[0].key if hasattr(path[0], "key")
                                       else str(path[0])) == "smpl_estimator"
            else nerf_label, {"model_coarse": params["model_coarse"],
                              "smpl_estimator": params["smpl_estimator"]}))
    train_params = {"model_coarse": params["model_coarse"],
                    "smpl_estimator": params["smpl_estimator"]}
    opt_state = tx.init(train_params)

    pose_loss = make_pose_loss(smpl_model, betas, cfg, model_coarse,
                               pos_enc, dir_enc)

    @jax.jit
    def step(train_params, opt_state, origins, dirs, z_vals, rgb_truth):
        def loss_fn(p):
            pose = estimator.apply(p["smpl_estimator"])[0]
            return pose_loss(p["model_coarse"], pose, origins, dirs, z_vals,
                             rgb_truth)

        loss, grads = jax.value_and_grad(loss_fn)(train_params)
        updates, opt_state = tx.update(grads, opt_state, train_params)
        train_params = optax.apply_updates(train_params, updates)
        return train_params, opt_state, loss

    h, w = train_data.h, train_data.w
    hw = h * w
    bs = min(int(args.batchsize), hw)
    n_img = train_data.num_images
    np_rng = np.random.RandomState(int(getattr(args, "seed", 0)))
    pose_errors = []
    for epoch in range(int(args.num_epochs)):
        losses = []
        for i in np_rng.permutation(n_img):
            sl = slice(i * hw, (i + 1) * hw)
            origins = jnp.asarray(train_data.origins[sl])
            dirs = jnp.asarray(train_data.directions[sl])
            rgb = jnp.asarray(train_data.rgb[sl])
            z_simple = jnp.asarray(_z_vals_simple(args))
            z_vals = z_vals_for_image(train_params["smpl_estimator"],
                                      origins, dirs, z_simple)
            perm = np_rng.permutation(hw)
            for lo in range(0, hw - bs + 1, bs):
                idx = jnp.asarray(perm[lo:lo + bs])
                train_params, opt_state, loss = step(
                    train_params, opt_state,
                    jnp.take(origins, idx, 0), jnp.take(dirs, idx, 0),
                    jnp.take(z_vals, idx, 0), jnp.take(rgb, idx, 0))
                losses.append(float(loss))
        est_p = jax.device_get(train_params["smpl_estimator"])
        # reference reports (arm_angle_l - gt[38])^2 + (arm_angle_r - gt[41])^2
        # (image_wise_solver.py:125-129)
        pose_err = (float(est_p["params"]["arm_angle_l"][0] - gt_pose[38]) ** 2
                    + float(est_p["params"]["arm_angle_r"][0] - gt_pose[41]) ** 2)
        pose_errors.append(pose_err)
        print(f"[image_wise epoch {epoch}] loss {np.mean(losses):.6f} "
              f"pose_err {pose_err:.6f}")
        if writer is not None:
            writer.add_scalar("loss/train", float(np.mean(losses)), epoch)
            writer.add_scalar("pose/error", pose_err, epoch)

    final = {"model_coarse": train_params["model_coarse"],
             "model_fine": params["model_fine"],
             "smpl_estimator": train_params["smpl_estimator"]}
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        checkpoints.save_run(log_dir, final, args, parser, args.dataset_dir)
        import json
        with open(os.path.join(log_dir, "pose_errors.json"), "w") as fh:
            json.dump({"pose_errors": pose_errors,
                       "best": min(pose_errors) if pose_errors else None,
                       "final": pose_errors[-1] if pose_errors else None}, fh)
    return final, pose_errors
