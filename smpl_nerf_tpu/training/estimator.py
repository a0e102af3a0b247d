"""Standalone supervised training of the SmplEstimator CNN.

Mirrors SmplEstimatorSolver (/root/reference/solver/smpl_estimator_solver.py:8-88):
MSE between predicted and ground-truth joint angles for the varied joints
(args.human_joints), Adam, whole-image batches.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smpl_nerf_tpu.training import checkpoints


def train_estimator(args, parser, train_data, val_data, models, params,
                    log_dir: Optional[str] = None, writer=None):
    model = models["smpl_estimator"]
    variables = params["smpl_estimator"]
    joints = [int(j) for j in args.human_joints]

    images = jnp.asarray(train_data.images)                       # [N, h, w, 3]
    poses = jnp.asarray(train_data.human_poses[:, joints])        # [N, J]
    val_images = jnp.asarray(val_data.images)
    val_poses = jnp.asarray(val_data.human_poses[:, joints])

    tx = optax.adam(float(args.lrate))
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(var_params, batch_stats, opt_state, imgs, gt, rng):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, imgs, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            return jnp.mean((out - gt) ** 2), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(var_params)
        updates, opt_state = tx.update(grads, opt_state, var_params)
        var_params = optax.apply_updates(var_params, updates)
        return var_params, new_stats, opt_state, loss

    @jax.jit
    def eval_loss(var_params, batch_stats, imgs, gt):
        out = model.apply({"params": var_params, "batch_stats": batch_stats}, imgs)
        return jnp.mean((out - gt) ** 2)

    var_params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(int(getattr(args, "seed", 0)))
    n = images.shape[0]
    bs = min(int(args.batchsize), n)
    np_rng = np.random.RandomState(0)
    for epoch in range(int(args.num_epochs)):
        perm = np_rng.permutation(n)
        losses = []
        for lo in range(0, n - bs + 1, bs):
            idx = jnp.asarray(perm[lo:lo + bs])
            rng, step_rng = jax.random.split(rng)
            var_params, batch_stats, opt_state, loss = step(
                var_params, batch_stats, opt_state,
                jnp.take(images, idx, 0), jnp.take(poses, idx, 0), step_rng)
            losses.append(float(loss))
        vloss = float(eval_loss(var_params, batch_stats, val_images, val_poses))
        print(f"[estimator epoch {epoch}] train {np.mean(losses):.5f} val {vloss:.5f}")
        if writer is not None:
            writer.add_scalar("loss/train", float(np.mean(losses)), epoch)
            writer.add_scalar("loss/val", vloss, epoch)

    final = {"smpl_estimator": {"params": var_params, "batch_stats": batch_stats}}
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        checkpoints.save_run(log_dir, final, args, parser, args.dataset_dir)
    return final
