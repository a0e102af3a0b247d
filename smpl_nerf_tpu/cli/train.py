"""Training entry point: python train.py --model_type=... --config=...

Same CLI contract as the reference's train.py (train.py:44-273) — model_type
dispatch, dataset loading, model construction, solver training, run-dir saving —
expressed through the factory/pipeline/solver stack instead of a 230-line elif
chain.
"""
from __future__ import annotations

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import os
from typing import Optional

import numpy as np

import jax

from smpl_nerf_tpu import config as config_mod
from smpl_nerf_tpu.data import datasets
from smpl_nerf_tpu.models import smpl as smpl_mod
from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
from smpl_nerf_tpu.training import checkpoints
from smpl_nerf_tpu.training.factory import build_models_and_params
from smpl_nerf_tpu.training.solver import Solver


def _default_log_dir(args) -> str:
    import time
    stamp = time.strftime("%b%d_%H-%M-%S")
    return os.path.join("runs", f"{stamp}_{args.experiment_name}")


def _smpl_model_for(args):
    path = getattr(args, "smpl_model_path", None)
    if path and os.path.exists(path):
        return smpl_mod.load_smpl_pkl(path)
    return smpl_mod.procedural_human()


def train(argv: Optional[list] = None, log_dir: Optional[str] = None,
          writer=None):
    parser = config_mod.config_parser()
    args = parser.parse_args(argv)
    if args.model_type not in config_mod.MODEL_TYPES:
        raise Exception("The model type you stated is unknown")
    if int(getattr(args, "multihost", 0)):
        # multi-host pods: same code; jax.devices() then spans the slice and
        # batches shard over every chip (SURVEY.md §2.9 communication plan)
        jax.distributed.initialize()
    if int(getattr(args, "check_nans", 0)):
        # sanitizer mode: XLA re-runs the offending jit op-by-op at the first
        # NaN and names the producing primitive (reference print_number_nans
        # analog, SURVEY §5 sanitizers)
        jax.config.update("jax_debug_nans", True)
    np.random.seed(int(getattr(args, "seed", 0)))
    rng = jax.random.PRNGKey(int(getattr(args, "seed", 0)))

    train_dir = os.path.join(args.dataset_dir, "train")
    val_dir = os.path.join(args.dataset_dir, "val")
    smpl_model = None
    if args.model_type in ("vertex_sphere", "dummy_dynamic", "image_wise_dynamic",
                           "append_vertex_locations_to_nerf"):
        smpl_model = _smpl_model_for(args)
        args._smpl_model = smpl_model
    train_data = datasets.load_dataset(train_dir, args.model_type, args)
    val_data = datasets.load_dataset(val_dir, args.model_type, args)

    # dataset-dependent extras for factory + pipeline
    extras = {}
    if smpl_model is not None:
        extras["smpl_model"] = smpl_model
        extras["num_vertices"] = smpl_model.num_vertices
    if train_data.human_poses is not None:
        extras["goal_poses"] = train_data.human_poses
    extras["betas"] = (train_data.betas if train_data.betas is not None
                       else np.zeros(10, np.float32))
    extras["num_images"] = train_data.num_images
    extras["image_size"] = (train_data.h, train_data.w)  # CNN estimator init

    if args.model_type == "image_wise_dynamic":
        from smpl_nerf_tpu.training.image_wise import train_image_wise
        return train_image_wise(args, parser, train_data, val_data, extras,
                                log_dir or _default_log_dir(args), writer)

    models, params, encoders = build_models_and_params(args, rng, extras)
    if args.load_run:
        params = checkpoints.load_run(args.load_run, params)
        print("Models loaded from", args.load_run)

    log_dir = log_dir or _default_log_dir(args)
    os.makedirs(log_dir, exist_ok=True)
    if writer is None:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(log_dir)
        except ImportError:
            writer = None

    # supervised CNN training has no render pipeline — branch BEFORE
    # build_pipeline (which rejects the model_type)
    if args.model_type == "smpl_estimator":
        from smpl_nerf_tpu.training.estimator import train_estimator
        return train_estimator(args, parser, train_data, val_data, models, params,
                               log_dir, writer)

    cfg = RenderConfig.from_args(args)
    pipeline = build_pipeline(cfg, models, encoders, extras)
    canonical_vertices = None
    if cfg.use_gmm_loss and smpl_model is None and train_data.betas is not None:
        smpl_model = _smpl_model_for(args)
    if cfg.use_gmm_loss and smpl_model is not None:
        import jax.numpy as jnp
        canonical_vertices = np.asarray(smpl_mod.smpl_forward(
            smpl_model, jnp.asarray(extras["betas"]).reshape(-1), jnp.zeros(69)))

    solver = Solver(pipeline, params, args, canonical_vertices,
                    log_dir=log_dir, writer=writer, parser=parser)
    if args.load_run:
        solver.restore_train_state(args.load_run)
    profile_dir = getattr(args, "profile_dir", None)
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            solver.train(train_data, val_data)
    else:
        solver.train(train_data, val_data)
    checkpoints.save_run(log_dir, solver.eval_params, args, parser,
                         args.dataset_dir)
    print("Run saved under", log_dir)
    if (int(getattr(args, "render_gif", 0))
            and args.model_type in ("append_smpl_params", "append_to_nerf",
                                    "nerf", "smpl_nerf")):
        # reference renders the whole train+val distribution after training
        # (train.py:183,203 -> inference.py:35-110)
        from smpl_nerf_tpu.cli.inference import inference_gif
        try:
            inference_gif(log_dir, args, train_data, val_data)
        except Exception as e:  # noqa: BLE001 — gif is best-effort
            print("inference_gif failed:", e)
    return solver


if __name__ == "__main__":
    train()
