"""Training solver: one jitted train_step + a thin epoch driver.

Replaces the reference's 11 solver classes (solver/*.py, SURVEY.md §2.5): the
per-variant deltas — which params train, at which learning rate, which loss
terms — are all config, not code:

  * loss = MSE(rgb_coarse) + MSE(rgb_fine) (reference nerf_solver.py:48-52),
  * + optional GMM density prior (smpl_nerf_solver.py:39-41; the reference's
    undefined args.restrict_gmm_loss flag is NOT reproduced),
  * optax.adam with a multi_transform putting estimator params on lrate_pose
    (reference append_vertices_solver.py:26-31, image_wise_solver.py:32-36),
  * frozen-NeRF pose optimization = zero-lr transform on the nerf params
    (image_wise path, train.py:253-259).

TPU-native details: batches are GATHERS from device-resident dataset arrays
performed inside the jitted step (no per-batch host->device copy); params and
optimizer state are donated so Adam updates in place; the whole coarse+fine
forward/backward is one XLA program; batch arrays are sharded over the mesh
'data' axis and gradient psums ride ICI.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smpl_nerf_tpu.core.gmm import GaussianMixture
from smpl_nerf_tpu.parallel import mesh as mesh_mod
from smpl_nerf_tpu import pipelines as pipelines_mod
from smpl_nerf_tpu.pipelines import Pipeline


def mse2psnr(mse: float) -> float:
    """Reference utils.py:484-488."""
    return -10.0 * np.log10(mse)


# families whose pipelines run SMPL LBS on the batch's unique image set when
# cfg.images_per_batch > 0 (pipelines._goal_verts_table)
DYNAMIC_FAMILIES = ("dummy_dynamic", "image_wise_dynamic",
                    "append_vertex_locations_to_nerf")


def foreground_split(rgb: np.ndarray, num_images: int, h: int, w: int,
                     white_background: bool,
                     tol: float = 0.02) -> Optional[np.ndarray]:
    """Classify each ray as foreground/background from its target color.

    Used by --foreground_sample_ratio oversampling. Round-3 hardening
    (VERDICT round-2 weak #5): the old heuristic compared every ray against
    the single top-left corner pixel of image 0, which silently degrades to
    noise on varied-background data (real photos, lego-style original_nerf).
    Now:
      * white_background runs: the background color is KNOWN (1,1,1) — exact.
      * otherwise: per-image border-median background estimate (border pixels
        of each image vote for that image's background color).
    Returns a bool [n] mask, or None when the split looks degenerate (most
    rays classified foreground ⇒ the background is not flat and oversampling
    would be noise — callers fall back to uniform sampling). A warning is
    printed in that case.
    """
    n = rgb.shape[0]
    if white_background:
        is_fg = np.any(np.abs(rgb - 1.0) > tol, axis=-1)
    elif num_images * h * w == n:
        imgs = rgb.reshape(num_images, h, w, 3)
        border = np.zeros((h, w), bool)
        border[0, :] = border[-1, :] = True
        border[:, 0] = border[:, -1] = True
        med = np.median(imgs[:, border], axis=1)        # [N_img, 3]
        dev = np.abs(imgs - med[:, None, None, :]).max(-1)
        is_fg = (dev > tol).reshape(-1)
    else:  # rays don't tile images (shouldn't happen for image datasets)
        is_fg = np.any(np.abs(rgb - rgb[0][None]) > tol, axis=-1)
    frac = float(is_fg.mean())
    if frac > 0.6:
        print(f"WARNING: foreground split looks degenerate ({frac:.0%} of "
              "rays classified foreground) — the background is probably not "
              "flat; disabling --foreground_sample_ratio oversampling "
              "(uniform ray sampling).")
        return None
    return is_fg


def nan_report(tree, name: str = "params") -> str:
    """Per-leaf NaN/Inf counts — the reference print_number_nans (utils.py:68-69)
    generalized to a whole pytree. Empty string when everything is finite."""
    lines = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(jax.device_get(leaf))
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n_nan = int(np.isnan(arr).sum())
        n_inf = int(np.isinf(arr).sum())
        if n_nan or n_inf:
            key = "/".join(str(getattr(p, "key", p)) for p in path)
            lines.append(f"  {name}{key}: {n_nan} NaN, {n_inf} Inf of {arr.size}")
    return "\n".join(lines)


def swap_pose_table(params, goal_poses):
    """Params with the dummy estimator's per-image pose table replaced.

    The table under smpl_estimator/constants/goal_poses holds the poses of
    the split the run was TRAINED on, but image_indices are split-LOCAL —
    evaluating a different split (validation, inference scoring) must look
    up that split's own poses. The reference instead scores val images
    against train-table rows of the same index (train.py:212,246 builds the
    estimator from train_data.goal_poses and never swaps) — a bug we do not
    reproduce. No-op for models without a table (CNN / image-wise
    estimators) or when goal_poses is None.
    """
    if goal_poses is None:
        return params
    old = pipelines_mod.get_pose_table(params)
    if old is None:
        return params
    est = params["smpl_estimator"]
    table = jnp.asarray(np.asarray(goal_poses, np.float32))
    if hasattr(old, "sharding"):
        # keep the (replicated) placement of the original table so the
        # swapped tree still matches the jitted step's sharding expectations
        table = jax.device_put(table, old.sharding)
    out = dict(params)
    out["smpl_estimator"] = dict(est)
    out["smpl_estimator"]["constants"] = dict(est["constants"])
    out["smpl_estimator"]["constants"]["goal_poses"] = table
    return out


def gather_batch_np(arrays: Dict[str, np.ndarray], idx: np.ndarray) -> dict:
    """Host-side (numpy) twin of gather_batch — multi-host batch assembly
    gathers rows on the host and ships only each process's slice to device."""
    batch = {k: np.take(v, idx, axis=0) for k, v in arrays.items()
             if not (k.endswith("_table") or k.endswith("_itable"))}
    for k, v in arrays.items():
        if k.endswith("_itable"):
            batch[k] = v            # whole per-image table, pipeline dedups
        elif k.endswith("_table"):
            img = batch["image_indices"].astype(np.int32)
            batch[k[:-len("_table")]] = np.take(v, img, axis=0)
    return batch


def gather_batch(arrays: Dict[str, jnp.ndarray], idx) -> dict:
    """Gather a ray batch from device-resident dataset arrays.

    Keys ending in '_table' are per-IMAGE arrays (e.g. 'human_pose_table'
    [N_img, 69]); they are mapped through the gathered image_indices so the
    pipeline still sees a per-ray batch key ('human_pose' [R, 69]) without the
    dataset ever materializing per-ray duplicates in HBM.

    Keys ending in '_itable' pass through UNGATHERED (the whole per-image
    table): the pipeline indexes them itself, deduping over the batch's
    unique images when images_per_batch is set — for big per-image payloads
    (goal meshes, [N_img, 6890, 3]) the per-ray '_table' expansion would
    gather ~R/K times more HBM than the size-K unique set needs.
    """
    batch = {k: jnp.take(v, idx, axis=0) for k, v in arrays.items()
             if not (k.endswith("_table") or k.endswith("_itable"))}
    for k, v in arrays.items():
        if k.endswith("_itable"):
            batch[k] = v            # whole per-image table, pipeline dedups
        elif k.endswith("_table"):
            img = batch["image_indices"].astype(jnp.int32)
            batch[k[:-len("_table")]] = jnp.take(v, img, axis=0)
    return batch


def make_loss_fn(pipeline: Pipeline, canonical_vertices: Optional[np.ndarray] = None):
    """Loss = MSE(coarse) + MSE(fine) [+ GMM density prior]."""
    cfg = pipeline.cfg
    gmm = None
    if cfg.use_gmm_loss and canonical_vertices is not None:
        gmm = GaussianMixture(np.asarray(canonical_vertices), cfg.gmm_std)

    def loss_fn(params, batch, rng, train=True, mask=None):
        """mask: optional [R] 0/1 weights — masked MEAN over real rays only
        (validation pads short batches; padded rays must not bias the loss
        that drives best-checkpoint selection)."""
        if mask is None:
            _mean = jnp.mean
        else:
            def _mean(x):
                # per-ray reduce first (mean over trailing dims == global mean
                # when every ray has the same element count), then masked mean
                per_ray = x.reshape(x.shape[0], -1).mean(-1)
                return jnp.sum(per_ray * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        out = pipeline(params, batch, rng, train)
        if cfg.model_type == "warp":
            # supervised warp training: MSE against the dataset's gt warp
            # (reference warp_solver.py:70-73)
            loss = _mean((out["warp"] - batch["warp"]) ** 2)
            return loss, {"loss": loss, "loss_coarse": loss, "loss_fine": loss}
        rgb_truth = batch["rgb"]
        loss_c = _mean((out["rgb_coarse"] - rgb_truth) ** 2)
        loss_f = _mean((out["rgb_fine"] - rgb_truth) ** 2)
        loss = loss_c + loss_f
        aux = {"loss_coarse": loss_c, "loss_fine": loss_f}
        if gmm is not None and "ray_samples" in out:
            # density prior: MSE(gmm.pdf(ray_samples), densities) — reference
            # smpl_nerf_solver.py:39-41 (its undefined restrict_gmm_loss flag
            # is treated as always-false, i.e. the loss applies when enabled)
            probs = gmm.pdf(out["ray_samples"])
            gmm_loss = _mean((probs - out["densities"]) ** 2)
            loss = loss + gmm_loss
            aux["loss_gmm"] = gmm_loss
        aux["loss"] = loss
        return loss, aux

    return loss_fn


def make_optimizer(params, args, model_type: str,
                   frozen_nerf: bool = False) -> optax.GradientTransformation:
    """Adam with param-group learning rates mirroring the reference solvers."""
    lrate = float(args.lrate)
    lrate_pose = float(args.lrate_pose)
    wd = float(getattr(args, "weight_decay", 0) or 0)
    decay_k = int(getattr(args, "lrate_decay", 0) or 0)
    pose_decay_k = int(getattr(args, "lrate_pose_decay", 0) or 0)

    def base_opt(lr, dk=None):
        if lr == 0.0:
            return optax.set_to_zero()
        dk = decay_k if dk is None else dk
        if dk > 0:
            # original-NeRF schedule: lr * 0.1^(step / (dk * 1000))
            lr = optax.exponential_decay(lr, dk * 1000, 0.1)
        if wd > 0:
            return optax.adamw(lr, weight_decay=wd)
        return optax.adam(lr)

    def label(path_key) -> str:
        keys = [p.key if hasattr(p, "key") else str(p) for p in path_key]
        # non-trainable collections (e.g. the dummy estimator's frozen pose
        # table lives under 'constants' — reference dummy_smpl_estimator_model.py
        # marks it requires_grad=False)
        if "constants" in keys or "batch_stats" in keys:
            return "frozen"
        if keys[0] == "smpl_estimator":
            return "pose"
        if frozen_nerf and keys[0] in ("model_coarse", "model_fine"):
            return "frozen"
        return "net"

    labels = jax.tree_util.tree_map_with_path(lambda path, _: label(path), params)
    return optax.multi_transform(
        {"net": base_opt(lrate),
         "pose": base_opt(lrate_pose, pose_decay_k or None),
         "frozen": optax.set_to_zero()},
        labels)


class Solver:
    """Epoch driver over the jitted train step.

    Handles: per-epoch ray permutation, sharded batches over the device mesh,
    early validation every log_iterations (reference nerf_solver.py:93-110),
    full validation with whole-image re-render PSNR, metric logging, and
    per-epoch checkpointing (reference nerf_solver.py:161-162).
    """

    def __init__(self, pipeline: Pipeline, params, args,
                 canonical_vertices: Optional[np.ndarray] = None,
                 frozen_nerf: bool = False,
                 mesh=None, log_dir: Optional[str] = None,
                 writer=None, parser=None):
        self.parser = parser
        from smpl_nerf_tpu.parallel import multihost
        self.pipeline = pipeline
        self.args = args
        self.mesh = mesh if mesh is not None else mesh_mod.make_mesh(
            getattr(args, "mesh_shape", ""))
        self.n_data = int(self.mesh.shape["data"])
        self.multihost = multihost.is_multihost()
        self.loss_fn = make_loss_fn(pipeline, canonical_vertices)
        self.optimizer = make_optimizer(params, args, args.model_type, frozen_nerf)
        self.tensor_parallel = (int(getattr(args, "tensor_parallel", 0) or 0) > 0
                                and int(self.mesh.shape["model"]) > 1)
        if self.multihost:
            # per-process placement via make_array_from_callback (device_put
            # cannot target non-addressable devices): replicated by default,
            # width-sharded when tensor_parallel is on
            if self.tensor_parallel:
                from smpl_nerf_tpu.parallel import tp
                self.params = multihost.put_tree(
                    params, tp.tp_param_shardings(params, self.mesh))
                self.opt_state = self.optimizer.init(self.params)
            else:
                self.params = multihost.put_replicated(params, self.mesh)
                self.opt_state = multihost.put_replicated(
                    jax.device_get(self.optimizer.init(params)), self.mesh)
        elif self.tensor_parallel:
            # width-shard the MLPs over the 'model' axis; optimizer state
            # inherits the kernel shardings from zeros_like
            from smpl_nerf_tpu.parallel import tp
            self.params = tp.place_params_tp(params, self.mesh)
            self.opt_state = self.optimizer.init(self.params)
        else:
            self.params = jax.device_put(params, mesh_mod.replicate_sharding(self.mesh))
            self.opt_state = jax.device_put(self.optimizer.init(self.params),
                                            mesh_mod.replicate_sharding(self.mesh))
        self.log_dir = log_dir
        self.writer = writer
        self.global_step = 0
        self.history: Dict[str, list] = {"train_loss": [], "val_loss": []}
        # resume accounting (restore_train_state): epoch numbering continues
        # and the pre-crash best-val snapshot is never clobbered by a worse
        # post-resume epoch
        self.epoch_offset = 0
        self.best_val = float("inf")
        self.val_curve = []  # per-epoch metrics, persisted as val_curve.json

        # --param_ema: exponential moving average of the weights, used for
        # validation + checkpoints (beyond-reference; the raw weights keep
        # training). The EMA update runs inside the jitted step / scan body.
        ema_decay = float(getattr(args, "param_ema", 0) or 0)
        self.ema_decay = ema_decay
        self.ema_params = (jax.tree.map(lambda x: x * 1.0, self.params)
                           if ema_decay > 0 else None)

        data_sh = mesh_mod.data_sharding(self.mesh)
        repl = mesh_mod.replicate_sharding(self.mesh)
        if self.tensor_parallel:
            # params/opt-state keep their width shardings: let XLA carry the
            # input shardings through (donation preserves layout)
            step_out_shardings = None
        else:
            step_out_shardings = (repl, repl, repl)

        def _ema(ema, params):
            return jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params)

        def step_body(params, opt_state, batch, rng):
            """grad -> optimizer update -> apply; shared by all step/scan
            variants so the training math lives in exactly one place."""
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch, rng, True)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, aux

        def gather_step_body(params, opt_state, arrays, idx, rng):
            batch = {k: jax.lax.with_sharding_constraint(
                        v, repl if k.endswith("_itable") else data_sh)
                     for k, v in gather_batch(arrays, idx).items()}
            return step_body(params, opt_state, batch, rng)

        @functools.partial(jax.jit, donate_argnums=(0, 1),
                           out_shardings=step_out_shardings)
        def train_step(params, opt_state, batch, rng):
            return step_body(params, opt_state, batch, rng)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                           out_shardings=None if step_out_shardings is None
                           else step_out_shardings + (repl,))
        def train_step_ema(params, opt_state, ema, batch, rng):
            params, opt_state, aux = step_body(params, opt_state, batch, rng)
            return params, opt_state, _ema(ema, params), aux

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_scan(params, opt_state, arrays, idx_block, rng):
            """K train steps in ONE dispatch (lax.scan over index blocks).

            Batches are gathers from the device-resident dataset arrays inside
            the scan body; sharding is re-constrained to the data axis after
            the gather. Amortizes per-step dispatch latency — on a tunnelled /
            remote TPU runtime this is the difference between dispatch-bound
            and compute-bound stepping.
            """
            keys = jax.random.split(rng, idx_block.shape[0])

            def body(carry, inp):
                params, opt_state = carry
                idx, sub = inp
                params, opt_state, aux = gather_step_body(
                    params, opt_state, arrays, idx, sub)
                return (params, opt_state), aux["loss"]

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx_block, keys))
            return params, opt_state, losses

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_scan_ema(params, opt_state, ema, arrays, idx_block, rng):
            """K train steps per dispatch with the EMA update fused in-scan."""
            keys = jax.random.split(rng, idx_block.shape[0])

            def body(carry, inp):
                params, opt_state, ema = carry
                idx, sub = inp
                params, opt_state, aux = gather_step_body(
                    params, opt_state, arrays, idx, sub)
                return (params, opt_state, _ema(ema, params)), aux["loss"]

            (params, opt_state, ema), losses = jax.lax.scan(
                body, (params, opt_state, ema), (idx_block, keys))
            return params, opt_state, ema, losses

        @jax.jit
        def eval_step(params, batch, mask=None):
            _, aux = self.loss_fn(params, batch, None, False, mask)
            return aux

        @jax.jit
        def render_step(params, batch):
            out = self.pipeline(params, batch, None, False)
            return out["rgb_coarse"], out["rgb_fine"]

        @jax.jit
        def debug_render_step(params, batch):
            out = self.pipeline(params, batch, None, False)
            return {k: out[k] for k in ("rgb_fine", "densities", "ray_samples", "warp")
                    if k in out}

        self._train_step = train_step
        self._train_step_ema = train_step_ema
        self._train_scan = train_scan
        self._train_scan_ema = train_scan_ema
        self._eval_step = eval_step
        self._render_step = render_step
        self._debug_render_step = debug_render_step
        self._data_sharding = data_sh

    def restore_train_state(self, run_dir: str) -> bool:
        """Restore optimizer moments (+ EMA shadow + raw weights + epoch /
        best-val accounting) saved by save_train_state.

        Complements --load_run's weight restore; returns False when the run
        dir predates train_state.npz (weights-only resume, reference
        behaviour). With --param_ema, --load_run put the EMA shadow into
        self.params; the raw training weights stored here replace it so the
        restored Adam moments keep tracking the trajectory they came from."""
        from smpl_nerf_tpu.training import checkpoints
        host_tpl = lambda t: None if t is None else checkpoints._host_tree(t)
        data = None
        if self.multihost:
            # every process must take the SAME branch before any collective:
            # learn existence + content from process 0 (ADVICE round-2 #1)
            data = checkpoints.broadcast_file(
                os.path.join(run_dir, "train_state.npz"))
            if data is None:
                return False
        # raw_template is always the params tree: a run saved WITH --param_ema
        # stores the raw training weights, and they must be restored even when
        # the resume drops --param_ema (else the Adam moments would track the
        # EMA shadow that --load_run put into params — ADVICE round-2 #2)
        opt, ema, raw, meta = checkpoints.load_train_state(
            run_dir, host_tpl(self.opt_state), host_tpl(self.ema_params),
            host_tpl(self.params), data=data)
        if opt is None:
            return False

        def place(host_tree, like_tree):
            if self.multihost:
                from smpl_nerf_tpu.parallel import multihost
                return multihost.put_tree(
                    host_tree, jax.tree.map(lambda x: x.sharding, like_tree))
            return jax.tree.map(lambda h, l: jax.device_put(h, l.sharding),
                                host_tree, like_tree)

        self.opt_state = place(opt, self.opt_state)
        if ema is not None and self.ema_params is not None:
            self.ema_params = place(ema, self.ema_params)
        if raw is not None:
            self.params = place(raw, self.params)
            if self.ema_params is None:
                print("WARNING: the saved run used --param_ema but this "
                      "resume does not; continuing from the RAW training "
                      "weights (matching the restored Adam moments). The "
                      "best-val EMA snapshot remains under the run dir.")
        if meta.get("epoch") is not None:
            self.epoch_offset = meta["epoch"] + 1
        if meta.get("best_val") is not None:
            self.best_val = meta["best_val"]
        print("Optimizer state restored from", run_dir,
              f"(epoch {meta.get('epoch')}, best val {meta.get('best_val')})")
        return True

    @property
    def eval_params(self):
        """Weights used for validation / rendering / checkpoints: the EMA
        shadow when --param_ema is on, the raw training weights otherwise."""
        return self.ema_params if self.ema_params is not None else self.params

    # ---------------------------------------------------------------- utils
    def _gather_batch(self, arrays: Dict[str, jnp.ndarray], idx: np.ndarray) -> dict:
        if self.multihost:
            from smpl_nerf_tpu.parallel import multihost
            batch_np = gather_batch_np(arrays, np.asarray(idx))
            return multihost.make_global_batch(batch_np, self.mesh)
        batch = gather_batch(arrays, jnp.asarray(idx))
        return mesh_mod.shard_batch(batch, self.mesh)

    def _shard_rows(self, x: np.ndarray):
        """Place a [bs, ...] host array sharded over the data axis."""
        if self.multihost:
            from smpl_nerf_tpu.parallel import multihost
            return multihost.make_global_batch({"x": x}, self.mesh)["x"]
        return jax.device_put(jnp.asarray(x), self._data_sharding)

    def _device_arrays(self, data, model_type):
        arrays = data.batch_arrays(model_type)
        if self.multihost:
            # multi-host: the dataset stays on HOST; batches are assembled
            # per-process each step (make_array_from_process_local_data)
            return {k: np.asarray(v) for k, v in arrays.items()}
        return {k: jnp.asarray(v) for k, v in arrays.items()}

    # ---------------------------------------------------------------- train
    def train(self, train_data, val_data, rng: Optional[jax.Array] = None,
              callback: Optional[Callable] = None):
        args = self.args
        rng = rng if rng is not None else jax.random.PRNGKey(int(getattr(args, "seed", 0)))
        model_type = args.model_type
        arrays = self._device_arrays(train_data, model_type)
        val_arrays = self._device_arrays(val_data, model_type)
        # dynamic-family validation must look poses up in the VAL split's
        # table (image_indices are split-local) — see swap_pose_table
        self._val_goal_poses = getattr(val_data, "human_poses", None)
        n = train_data.num_rays
        bs = mesh_mod.pad_to_multiple(int(args.batchsize), self.n_data)
        steps_per_epoch = int(getattr(args, "steps_per_epoch", 0)) or max(1, n // bs)

        # resumed runs continue the global-step / epoch numbering
        self.global_step = max(self.global_step,
                               self.epoch_offset * steps_per_epoch)
        scan_steps = int(getattr(args, "scan_steps", 0) or 0)
        early_val = bool(int(getattr(args, "early_validation", 0)))
        if scan_steps > 1 and early_val:
            print("WARNING: --early_validation needs per-step host control; "
                  f"--scan_steps={scan_steps} is ignored (stepping one dispatch "
                  "per batch).")
        if scan_steps > 1 and self.multihost:
            print("WARNING: multi-host batches are assembled per process per "
                  f"step; --scan_steps={scan_steps} is ignored.")
            scan_steps = 0
        np_rng = np.random.RandomState(int(getattr(args, "seed", 0)))

        # foreground-weighted ray sampling: synthetic human scenes are ~95%
        # background; with white-background compositing, uniform sampling lets
        # epoch 0 push sigma so negative everywhere that relu gradients die
        # (the transparent-scene fixed point). Oversampling foreground rays
        # keeps the object gradient alive. 0 = reference-uniform behaviour.
        fg_ratio = float(getattr(args, "foreground_sample_ratio", 0.0) or 0.0)
        fg_idx = bg_idx = None
        if fg_ratio > 0.0:
            is_fg = foreground_split(
                np.asarray(train_data.rgb), train_data.num_images,
                train_data.h, train_data.w,
                bool(int(getattr(args, "white_background", 0))))
            fg_idx = None if is_fg is None else np.where(is_fg)[0]
            bg_idx = None if is_fg is None else np.where(~is_fg)[0]
            if fg_idx is None or len(fg_idx) == 0 or len(bg_idx) == 0:
                fg_ratio, fg_idx, bg_idx = 0.0, None, None
            else:
                print(f"foreground sampling: {len(fg_idx)}/{n} fg rays, "
                      f"ratio {fg_ratio}")

        # images-per-batch sampling (dynamic families): draw each batch from at
        # most K images so the in-step estimator+LBS runs on K poses, not every
        # dataset image. Rays are stored contiguously per image (datasets.py).
        ipb = int(getattr(args, "images_per_batch", 0) or 0)
        n_img = train_data.num_images
        hw = n // max(1, n_img)
        ipb = ipb if 0 < ipb < n_img else 0
        bs_val = mesh_mod.pad_to_multiple(int(args.batchsize_val), self.n_data)
        if (ipb and model_type in DYNAMIC_FAMILIES
                and bs_val > max(1, (ipb - 1)) * hw):
            # sequential val batches must fit inside the size-K unique set too
            # (the exact per-batch guard in _validate also catches stride cases)
            raise ValueError(
                f"images_per_batch={ipb}: batchsize_val={bs_val} (padded) can "
                f"span more than {ipb} images ({hw} rays/image); lower "
                "batchsize_val or raise images_per_batch")
        fg_mask = None
        if ipb and fg_ratio > 0.0:
            fg_mask = np.zeros(n, bool)
            fg_mask[fg_idx] = True

        def draw_batch_indices():
            if ipb:
                imgs = np_rng.choice(n_img, ipb, replace=False)
                cand = (imgs[:, None] * hw
                        + np.arange(hw)[None, :]).reshape(-1)  # rays of K images
                if fg_ratio > 0.0:
                    cfg_, cbg = cand[fg_mask[cand]], cand[~fg_mask[cand]]
                    if len(cfg_) and len(cbg):
                        n_fg = int(bs * fg_ratio)
                        return np.concatenate([
                            cfg_[np_rng.randint(0, len(cfg_), n_fg)],
                            cbg[np_rng.randint(0, len(cbg), bs - n_fg)]])
                return cand[np_rng.randint(0, len(cand), bs)]
            n_fg = int(bs * fg_ratio)
            fg = fg_idx[np_rng.randint(0, len(fg_idx), n_fg)]
            bg = bg_idx[np_rng.randint(0, len(bg_idx), bs - n_fg)]
            return np.concatenate([fg, bg])

        for epoch in range(int(args.num_epochs)):
            perm = np_rng.permutation(n)
            epoch_losses = []
            t0 = time.time()
            if scan_steps > 1 and not early_val:
                # scan-fused stepping: K steps per dispatch
                step = 0
                while step < steps_per_epoch:
                    k = min(scan_steps, steps_per_epoch - step)
                    idx_block = np.empty((k, bs), np.int32)
                    for j in range(k):
                        if fg_ratio > 0.0 or ipb:
                            idx_block[j] = draw_batch_indices()
                            continue
                        lo = ((step + j) * bs) % max(1, n - bs + 1) if n >= bs else 0
                        idx = perm[lo:lo + bs]
                        if len(idx) < bs:
                            idx = np.concatenate([idx, perm[:bs - len(idx)]])
                        idx_block[j] = idx
                    rng, step_rng = jax.random.split(rng)
                    if self.ema_params is not None:
                        (self.params, self.opt_state, self.ema_params,
                         losses) = self._train_scan_ema(
                            self.params, self.opt_state, self.ema_params,
                            arrays, jnp.asarray(idx_block), step_rng)
                    else:
                        self.params, self.opt_state, losses = self._train_scan(
                            self.params, self.opt_state, arrays,
                            jnp.asarray(idx_block), step_rng)
                    epoch_losses.extend(np.asarray(losses).tolist())
                    step += k
                    self.global_step += k
            else:
                for step in range(steps_per_epoch):
                    if fg_ratio > 0.0 or ipb:
                        idx = draw_batch_indices()
                    else:
                        lo = (step * bs) % max(1, n - bs + 1) if n >= bs else 0
                        idx = perm[lo:lo + bs]
                        if len(idx) < bs:  # wrap around for tiny datasets
                            idx = np.concatenate([idx, perm[:bs - len(idx)]])
                    batch = self._gather_batch(arrays, idx)
                    rng, step_rng = jax.random.split(rng)
                    if self.ema_params is not None:
                        (self.params, self.opt_state, self.ema_params,
                         aux) = self._train_step_ema(
                            self.params, self.opt_state, self.ema_params,
                            batch, step_rng)
                    else:
                        self.params, self.opt_state, aux = self._train_step(
                            self.params, self.opt_state, batch, step_rng)
                    epoch_losses.append(aux["loss"])
                    self.global_step += 1
                    if early_val and step % int(args.log_iterations) == 0:
                        val_loss = self._validate(val_arrays, val_data.num_rays,
                                                  epoch=self.global_step)
                        self._log("val_loss_early", val_loss)
            train_loss = float(np.mean([float(l) for l in epoch_losses]))
            if int(getattr(args, "check_nans", 0)) and not np.isfinite(train_loss):
                report = nan_report(self.params)
                raise RuntimeError(
                    f"non-finite train loss {train_loss} at epoch {epoch}"
                    + (f"; non-finite params:\n{report}" if report else
                       " (params still finite - NaN originated in the loss)"))
            val_loss = self._validate(val_arrays, val_data.num_rays,
                                      epoch=self.epoch_offset + epoch,
                                      full=epoch == int(args.num_epochs) - 1)
            dt = time.time() - t0
            rays_per_sec = steps_per_epoch * bs / dt
            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)
            self._log("loss/train", train_loss)
            self._log("loss/val", val_loss)
            self._log("perf/rays_per_sec", rays_per_sec)
            print(f"[epoch {self.epoch_offset + epoch}] "
                  f"train {train_loss:.5f} val {val_loss:.5f} "
                  f"psnr {mse2psnr(max(val_loss / 2, 1e-10)):.2f} "
                  f"({rays_per_sec:,.0f} rays/s)")
            if self.writer is not None:
                self._log_rerenders(val_arrays, val_data, epoch)
            if callback is not None:
                callback(self, epoch)
            if self.log_dir:
                # NOTE: called from EVERY process — the save functions gather
                # multihost-sharded trees collectively and only process 0
                # writes files
                from smpl_nerf_tpu.training import checkpoints
                checkpoints.save_run(self.log_dir, self.eval_params, args,
                                     self.parser)
                # machine-readable per-epoch curve: tunnel outages routinely
                # cut runs mid-budget, and the in-training val estimate is
                # then the only quality evidence — keep it as an artifact
                # (absolute epoch numbering survives --load_run resumes)
                if jax.process_index() == 0:
                    import json
                    self.val_curve.append({
                        "epoch": self.epoch_offset + epoch,
                        "train_loss": float(train_loss),
                        "val_loss": float(val_loss),
                        "psnr_estimate": float(mse2psnr(max(val_loss / 2, 1e-10))),
                        "rays_per_sec": round(rays_per_sec, 1)})
                    with open(os.path.join(self.log_dir, "val_curve.json"),
                              "w") as fh:
                        json.dump(self.val_curve, fh, indent=1)
                # full-fidelity resume state (optimizer moments + EMA shadow
                # + the raw weights the moments belong to): a crash mid-run
                # resumes without restarting Adam cold
                checkpoints.save_train_state(
                    self.log_dir, self.opt_state, self.ema_params,
                    self.epoch_offset + epoch,
                    raw_params=self.params if self.ema_params is not None
                    else None,
                    best_val=min(self.best_val, val_loss))
                # keep the best-validation snapshot separately (the reference
                # only keeps the last epoch; validation is noisy under sigma
                # noise so the final epoch can regress)
                if val_loss <= min(self.history["val_loss"] + [self.best_val]):
                    self.best_val = val_loss
                    checkpoints.save_run(os.path.join(self.log_dir, "best"),
                                         self.eval_params, args, self.parser,
                                         getattr(args, "dataset_dir", None))
        return self.params

    def _log_rerenders(self, val_arrays, val_data, epoch: int):
        """GT-vs-rerender grids + warp clouds + density dumps per epoch.

        Parity with the reference's per-epoch validation logging
        (nerf_solver.py:137-159: accumulate whole images, tensorboard_rerenders,
        vedo_data density point clouds).
        """
        from smpl_nerf_tpu.training import logging as log_mod
        n_img = min(int(self.args.number_validation_images), val_data.num_images)
        if n_img <= 0:
            return
        hw = val_data.h * val_data.w
        bs = mesh_mod.pad_to_multiple(min(hw, 4096), self.n_data)
        # warp point clouds at the mesh_epochs fractions (reference
        # warp_solver.py:117-122 logs meshes at fractional-epoch milestones)
        mesh_epochs = {int(float(f) * int(self.args.num_epochs))
                       for f in getattr(self.args, "mesh_epochs", []) or []}
        warp_cloud = epoch in mesh_epochs
        eval_params = swap_pose_table(self.eval_params,
                                      getattr(val_data, "human_poses", None))
        renders, gts, warps, densities, samples = [], [], None, [], []
        for i in range(n_img):
            rgb_img, warp_img = [], []
            for lo in range(i * hw, (i + 1) * hw, bs):
                idx = np.arange(lo, min(lo + bs, (i + 1) * hw))
                pad = bs - len(idx)
                if pad:
                    idx = np.concatenate([idx, np.full(pad, idx[-1])])
                batch = self._gather_batch(val_arrays, idx)
                out = self._debug_render_step(eval_params, batch)
                take = bs - pad
                rgb_img.append(np.asarray(out["rgb_fine"])[:take])
                if "warp" in out:
                    warp_img.append(
                        np.linalg.norm(np.asarray(out["warp"])[:take], axis=-1).max(-1))
                if lo == i * hw and "densities" in out and "ray_samples" in out:
                    densities.append(np.asarray(out["densities"])[:take])
                    samples.append(np.asarray(out["ray_samples"])[:take])
                    if warp_cloud and "warp" in out and i == 0:
                        log_mod.tensorboard_warps(
                            self.writer, self.global_step,
                            np.asarray(out["ray_samples"])[:take],
                            np.asarray(out["warp"])[:take])
            renders.append(np.concatenate(rgb_img).reshape(val_data.h, val_data.w, 3))
            gts.append(val_data.rgb[i * hw:(i + 1) * hw].reshape(val_data.h, val_data.w, 3))
            if warp_img:
                if warps is None:
                    warps = []
                warps.append(np.concatenate(warp_img).reshape(val_data.h, val_data.w))
        log_mod.tensorboard_rerenders(self.writer, n_img, np.stack(renders),
                                      np.stack(gts), self.global_step,
                                      np.stack(warps) if warps else None)
        if self.log_dir and densities:
            log_mod.vedo_data(self.log_dir, densities[0], samples[0], epoch=epoch)

    def _check_batch_images(self, idx: np.ndarray, image_indices: np.ndarray,
                            arrays=None):
        """Loud guard for images_per_batch: the in-step size-K jnp.unique would
        SILENTLY map overflow rays to the wrong image's SMPL vertices, so any
        eval/render batch spanning more than K images must fail here instead.
        Applies to the dynamic families and to vertex_sphere when its in-step
        mesh table ('goal_verts_itable') is deduped the same way."""
        K = int(self.pipeline.cfg.images_per_batch or 0)
        dedups = (self.pipeline.cfg.model_type in DYNAMIC_FAMILIES
                  or (arrays is not None and "goal_verts_itable" in arrays))
        if not K or not dedups:
            return
        n_img = int(image_indices.max()) + 1
        if K >= n_img:
            return
        distinct = len(np.unique(image_indices[idx]))
        if distinct > K:
            raise ValueError(
                f"images_per_batch={K}: an evaluation batch spans {distinct} "
                "distinct images; lower batchsize_val / adjust val_rays or "
                "raise images_per_batch")

    def _validate(self, val_arrays, n_val: int, epoch: int = 0,
                  full: bool = False) -> float:
        """Masked validation loss over the FULL val set (or a strided subset).

        Every ray is visited exactly once — the tail batch is padded to the
        static batch shape and the pads masked out of the mean, so the loss
        that drives best-checkpoint selection is unbiased (the reference's
        range(0, n - bs + 1, bs) loop silently dropped the tail).

        --val_rays > 0 caps per-epoch validation cost for reference-scale runs
        (a 58-image 256x256 val split is 3.8M rays) with a stride over the
        whole set whose OFFSET is reseeded per epoch — round-2's fixed
        linspace subset was perfectly correlated across epochs, so
        best-checkpoint selection optimized one subsample. The last epoch
        (`full=True`) always validates the full set so the final selection
        comparison includes one unbiased measurement; full-set scores come
        from cli/inference.py either way.
        """
        eval_params = swap_pose_table(self.eval_params,
                                      getattr(self, "_val_goal_poses", None))
        val_rays = int(getattr(self.args, "val_rays", 0) or 0)
        if not full and 0 < val_rays < n_val:
            stride = n_val / val_rays
            offset = np.random.RandomState(
                int(getattr(self.args, "seed", 0) or 0) * 1000003 + epoch
            ).uniform(0.0, stride)
            all_idx = np.minimum(np.arange(val_rays) * stride + offset,
                                 n_val - 1).astype(np.int64)
        else:
            all_idx = np.arange(n_val, dtype=np.int64)
        bs = mesh_mod.pad_to_multiple(int(self.args.batchsize_val), self.n_data)
        img_idx_np = (np.asarray(val_arrays["image_indices"])
                      if self.pipeline.cfg.images_per_batch else None)
        total, weight = 0.0, 0.0
        for lo in range(0, len(all_idx), bs):
            idx = all_idx[lo:lo + bs]
            n_real = len(idx)
            if n_real < bs:
                idx = np.concatenate([idx, np.full(bs - n_real, idx[-1])])
            if img_idx_np is not None:
                self._check_batch_images(idx, img_idx_np, val_arrays)
            mask = np.zeros(bs, np.float32)
            mask[:n_real] = 1.0
            batch = self._gather_batch(val_arrays, idx)
            aux = self._eval_step(eval_params, batch, self._shard_rows(mask))
            total += float(aux["loss"]) * n_real
            weight += n_real
        return total / weight if weight else float("nan")

    def render_rays_batched(self, data, model_type: Optional[str] = None,
                            batch_size: Optional[int] = None,
                            render_fn: Optional[Callable] = None,
                            render_fn_per_image: Optional[Callable] = None
                            ) -> np.ndarray:
        """Render every ray of `data`; returns rgb_fine [N, 3] on host.

        render_fn: optional (params, batch) -> rgb [bs, 3] override — e.g. the
        foreground-culled renderer (render/fast.make_fast_renderer).
        render_fn_per_image: optional (image_index) -> render_fn factory; when
        given, batches are aligned to image boundaries (never mixing rays of
        two images) and the factory is called once per image — used by the
        occupancy renderer to bake one density grid per body pose.
        """
        model_type = model_type or self.args.model_type
        arrays = self._device_arrays(data, model_type)
        # dynamic-family scoring: image_indices are split-local, so the
        # estimator must carry THIS split's pose table (the restored params
        # hold the table of the split the run was trained on)
        eval_params = swap_pose_table(self.eval_params,
                                      getattr(data, "human_poses", None))
        n = data.num_rays
        bs = batch_size or mesh_mod.pad_to_multiple(
            int(self.args.batchsize_val), self.n_data)
        bs = mesh_mod.pad_to_multiple(bs, self.n_data)
        out = np.zeros((n, 3), np.float32)
        img_idx_np = (np.asarray(arrays["image_indices"])
                      if self.pipeline.cfg.images_per_batch
                      and "image_indices" in arrays else None)
        if render_fn_per_image is not None:
            hw = n // max(1, data.num_images)
            spans = [(i * hw, (i + 1) * hw, i) for i in range(data.num_images)]
        else:
            spans = [(0, n, None)]
        for span_lo, span_hi, img_i in spans:
            # factory invoked lazily per image: exactly ONE baked grid is
            # alive at a time and the bake interleaves with rendering
            fn = (render_fn_per_image(img_i) if img_i is not None
                  else render_fn)
            for lo in range(span_lo, span_hi, bs):
                idx = np.arange(lo, min(lo + bs, span_hi))
                pad = bs - len(idx)
                if pad:
                    # pad with the LAST ray, not ray 0: ray-0 duplicates would
                    # compete in the fast renderer's top-K opacity cull and can
                    # inject image 0 into a dynamic-family batch
                    idx = np.concatenate([idx, np.full(pad, idx[-1])])
                if img_idx_np is not None:
                    self._check_batch_images(idx, img_idx_np, val_arrays)
                batch = self._gather_batch(arrays, idx)
                if fn is not None:
                    rgb_fine = fn(eval_params, batch)
                else:
                    _, rgb_fine = self._render_step(eval_params, batch)
                out[lo:lo + bs - pad] = np.asarray(rgb_fine)[:bs - pad]
        return out

    def _log(self, tag: str, value: float):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, self.global_step)
