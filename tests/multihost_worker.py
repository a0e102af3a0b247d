"""Worker for the 2-process multi-host CPU test (spawned by test_multihost.py).

Each process owns 4 virtual CPU devices; jax.distributed.initialize stitches
them into one 8-device mesh. The worker assembles globally-sharded batches
from per-process rows (parallel/multihost.py) and trains a tiny nerf solver;
the parent test asserts both processes print identical losses, equal to a
single-process 8-device run of the same seeded problem.
"""
import os
import sys

if __name__ == "__main__":
    # only when spawned as a worker process — importing this module from the
    # test session must NOT clobber conftest's 8-virtual-device setup
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def make_data_and_args(extra_argv=()):
    import numpy as np
    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.core import cameras
    from smpl_nerf_tpu.data import datasets

    cams, _ = cameras.get_circle_poses(-90, 90, 2, 2.4)
    data = datasets.rays_from_cameras(cams, 8, 8, 3.14159 / 3)
    rng = np.random.RandomState(0)
    data.rgb = rng.uniform(0, 1, data.rgb.shape).astype(np.float32)
    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=nerf", "--num_epochs=2",
        "--batchsize=32", "--batchsize_val=32", "--number_coarse_samples=4",
        "--run_fine=0", "--sigma_noise_std=0", "--netdepth=2", "--netwidth=16",
        "--number_frequencies_postitional=2", "--number_frequencies_directional=1",
        "--use_pallas=0", "--steps_per_epoch=3", *extra_argv])
    return data, args


def run_training(extra_argv=(), log_dir=None, return_solver=False):
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.training.factory import build_models_and_params
    from smpl_nerf_tpu.training.solver import Solver

    data, args = make_data_and_args(extra_argv)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    solver = Solver(pipeline, params, args, log_dir=log_dir)
    solver.train(data, data)
    if return_solver:
        return solver.history, solver, (pipeline, params, args)
    return solver.history


def main():
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=process_id)
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np
    from smpl_nerf_tpu.parallel import mesh as mesh_mod
    from smpl_nerf_tpu.parallel import multihost

    # batch-assembly correctness: per-process rows -> global array == full batch
    mesh = mesh_mod.make_mesh()
    full = np.arange(48, dtype=np.float32).reshape(16, 3)
    g = multihost.make_global_batch({"x": full}, mesh)["x"]
    out = jax.jit(lambda a: a * 1.0,
                  out_shardings=mesh_mod.replicate_sharding(mesh))(g)
    np.testing.assert_allclose(np.asarray(out), full)
    print(f"ASSEMBLY_OK process={process_id}")

    history = run_training()
    losses = ",".join(f"{l:.8f}" for l in history["train_loss"])
    vals = ",".join(f"{l:.8f}" for l in history["val_loss"])
    print(f"LOSSES process={process_id} train={losses} val={vals}")

    # multi-host TENSOR PARALLEL: 4x2 mesh spanning both processes, MLP widths
    # sharded over 'model' via make_array_from_callback placement
    tp_argv = ("--mesh_shape=4,2", "--tensor_parallel=1")
    history_tp = run_training(tp_argv)
    losses_tp = ",".join(f"{l:.8f}" for l in history_tp["train_loss"])
    print(f"TP_LOSSES process={process_id} train={losses_tp}")

    # cross-process TP checkpointing: save_run/save_train_state gather the
    # width-sharded params/moments collectively (checkpoints._host_tree) and
    # restore_train_state places them back — the non-addressable-device path
    # jax.device_get alone cannot handle
    import os as _os
    log_dir = _os.environ.get("MH_LOG_DIR")
    if log_dir:
        from smpl_nerf_tpu.training.solver import Solver
        from smpl_nerf_tpu.training import checkpoints
        _, solver, (pipeline, params, args) = run_training(
            tp_argv + ("--param_ema=0.5",), log_dir=log_dir,
            return_solver=True)
        restored_params = checkpoints.load_run(log_dir, params)
        solver2 = Solver(pipeline, restored_params, args)
        ok = solver2.restore_train_state(log_dir)
        same = all(
            bool(np.allclose(np.asarray(checkpoints._host_tree(a)),
                             np.asarray(checkpoints._host_tree(b))))
            for a, b in zip(jax.tree_util.tree_leaves(solver2.opt_state),
                            jax.tree_util.tree_leaves(solver.opt_state)))
        print(f"TP_CKPT process={process_id} restored={ok} match={same} "
              f"offset={solver2.epoch_offset}")

        # ADVICE round-2 #1: train_state.npz visible ONLY to process 0 (no
        # shared filesystem). Every process must take the same branch —
        # process 1 learns existence AND content from process 0's broadcast
        # instead of returning False / deadlocking in the collectives.
        private_dir = log_dir if process_id == 0 else log_dir + "_not_visible"
        solver3 = Solver(pipeline, restored_params, args)
        ok_private = solver3.restore_train_state(private_dir)
        match_private = all(
            bool(np.allclose(np.asarray(checkpoints._host_tree(a)),
                             np.asarray(checkpoints._host_tree(b))))
            for a, b in zip(jax.tree_util.tree_leaves(solver3.opt_state),
                            jax.tree_util.tree_leaves(solver.opt_state)))
        print(f"PRIVATE_CKPT process={process_id} restored={ok_private} "
              f"match={match_private}")


if __name__ == "__main__":
    main()
