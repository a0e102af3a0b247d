"""Solver feature tests: GMM prior loss, load_run resume, optimizer groups."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu import config as config_mod
from smpl_nerf_tpu.data import datasets, generate
from smpl_nerf_tpu.models import smpl as smpl_mod
from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
from smpl_nerf_tpu.training import checkpoints
from smpl_nerf_tpu.training.factory import build_models_and_params
from smpl_nerf_tpu.training.solver import (Solver, gather_batch, make_loss_fn,
                                            make_optimizer)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds_solver")
    parser = config_mod.dataset_config_parser()
    args = parser.parse_args([f"--save_dir={d}", "--dataset_type=smpl_nerf",
                              "--resolution=12", "--camera_path=circle",
                              "--number_steps=4", "--train_val_ratio=0.75"])
    generate.create_dataset(args, parser)
    return str(d)


def _args(ds_dir, **overrides):
    parser = config_mod.config_parser()
    argv = ["--config=/dev/null", "--model_type=smpl_nerf", f"--dataset_dir={ds_dir}",
            "--num_epochs=1", "--batchsize=64", "--batchsize_val=64",
            "--number_coarse_samples=4", "--run_fine=0", "--sigma_noise_std=0",
            "--netdepth=2", "--netwidth=16", "--netwidth_warp=8",
            "--number_frequencies_postitional=2", "--number_frequencies_directional=1",
            "--number_frequencies_pose=2", "--human_pose_encoding=1", "--use_pallas=0"]
    for k, v in overrides.items():
        argv.append(f"--{k}={v}")
    return parser.parse_args(argv), parser


def test_gmm_prior_loss_activates(ds, rng):
    args, _ = _args(ds, use_gmm_loss=1, gmm_std=0.07)
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "smpl_nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    human = smpl_mod.procedural_human(rings=3, segments=6)
    canonical = np.asarray(smpl_mod.smpl_forward(human, jnp.zeros(10), jnp.zeros(69)))
    loss_fn = make_loss_fn(pipeline, canonical)
    arrays = {k: jnp.asarray(v) for k, v in train_data.batch_arrays("smpl_nerf").items()}
    batch = gather_batch(arrays, jnp.arange(32))
    loss, aux = loss_fn(params, batch, jax.random.PRNGKey(1), True)
    assert "loss_gmm" in aux
    assert float(aux["loss_gmm"]) >= 0
    assert np.isfinite(float(loss))
    # the total includes the gmm term
    np.testing.assert_allclose(float(loss),
                               float(aux["loss_coarse"] + aux["loss_fine"]
                                     + aux["loss_gmm"]), rtol=1e-6)


def test_load_run_resume(ds, tmp_path):
    args, parser = _args(ds)
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "smpl_nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    solver = Solver(pipeline, params, args)
    solver.train(train_data, train_data)
    run_dir = str(tmp_path / "run")
    checkpoints.save_run(run_dir, solver.params, args, parser)

    _, params2, _ = build_models_and_params(args, jax.random.PRNGKey(1), {})
    restored = checkpoints.load_run(run_dir, params2)
    for a, b in zip(jax.tree_util.tree_leaves(solver.params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_validate_covers_tail_unbiased(ds):
    """batchsize_val not dividing n_val: every ray counted once, no pad bias.

    The reference's val loop (nerf_solver.py range(0, n-bs+1, bs)) silently
    dropped the tail; ours must equal the exact full-set loss.
    """
    args, _ = _args(ds, batchsize_val=50)   # n_val = 144, tail of 44
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "smpl_nerf", args)
    val_data = datasets.load_dataset(os.path.join(ds, "val"), "smpl_nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    solver = Solver(pipeline, params, args)
    val_arrays = solver._device_arrays(val_data, "smpl_nerf")
    n_val = val_data.num_rays
    assert n_val % 50 != 0
    got = solver._validate(val_arrays, n_val)
    full_batch = gather_batch(val_arrays, jnp.arange(n_val))
    want, _ = solver.loss_fn(solver.params, full_batch, None, False)
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_val_rays_subset(ds):
    """--val_rays caps per-epoch validation to a strided subset whose offset
    is reseeded per epoch (round-3: subsets de-correlate across epochs, and
    the final epoch always validates the full set)."""
    args, _ = _args(ds, batchsize_val=32, val_rays=64)
    val_data = datasets.load_dataset(os.path.join(ds, "val"), "smpl_nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    solver = Solver(pipeline, params, args)
    val_arrays = solver._device_arrays(val_data, "smpl_nerf")
    n_val = val_data.num_rays
    got = solver._validate(val_arrays, n_val, epoch=3)
    stride = n_val / 64
    offset = np.random.RandomState(3).uniform(0.0, stride)
    idx = np.minimum(np.arange(64) * stride + offset, n_val - 1).astype(np.int64)
    batch = gather_batch(val_arrays, jnp.asarray(idx))
    want, _ = solver.loss_fn(solver.params, batch, None, False)
    np.testing.assert_allclose(got, float(want), rtol=1e-5)
    # different epochs really do sample different subsets
    assert solver._validate(val_arrays, n_val, epoch=4) != got
    # full=True ignores --val_rays: equals the exact full-set loss
    full = solver._validate(val_arrays, n_val, epoch=3, full=True)
    full_batch = gather_batch(val_arrays, jnp.arange(n_val))
    want_full, _ = solver.loss_fn(solver.params, full_batch, None, False)
    np.testing.assert_allclose(full, float(want_full), rtol=1e-5)


def test_pose_table_gather_matches_per_ray(ds):
    """human_pose_table + image_indices gather == per-ray materialized poses."""
    args, _ = _args(ds)
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "smpl_nerf", args)
    arrays = {k: jnp.asarray(v)
              for k, v in train_data.batch_arrays("smpl_nerf").items()}
    assert "human_pose_table" in arrays
    idx = jnp.asarray([0, 5, 300, train_data.num_rays - 1])
    batch = gather_batch(arrays, idx)
    want = train_data.human_poses[train_data.image_indices[np.asarray(idx)]]
    np.testing.assert_allclose(np.asarray(batch["human_pose"]), want)


def test_optimizer_labels_frozen_nerf():
    import optax
    params = {"model_coarse": {"w": jnp.ones(3)}, "model_fine": {"w": jnp.ones(3)},
              "smpl_estimator": {"params": {"a": jnp.ones(1)}}}

    class A:
        lrate, lrate_pose, weight_decay = 1e-3, 0.1, 0

    tx = make_optimizer(params, A, "image_wise_dynamic", frozen_nerf=True)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen nerf params get zero updates; estimator params move
    np.testing.assert_allclose(np.asarray(updates["model_coarse"]["w"]), 0.0)
    assert np.abs(np.asarray(updates["smpl_estimator"]["params"]["a"])).max() > 0


def test_lrate_pose_decay_only_shrinks_pose_updates():
    """--lrate_pose_decay decays the estimator group; net lr stays constant."""
    params = {"model_coarse": {"w": jnp.ones(3)},
              "smpl_estimator": {"params": {"a": jnp.ones(1)}}}

    class A:
        lrate, lrate_pose, weight_decay = 1e-3, 0.1, 0
        lrate_pose_decay = 1  # 0.1x over 1000 steps

    tx = make_optimizer(params, A, "image_wise_dynamic")
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    first, state = tx.update(grads, state, params)
    last = first
    for _ in range(500):  # the (501)th call sees schedule step 500
        last, state = tx.update(grads, state, params)
    # pose lr at step 500 is 0.1^(500/1000) ~ 0.316x the step-0 lr
    pose0 = abs(float(first["smpl_estimator"]["params"]["a"][0]))
    pose500 = abs(float(last["smpl_estimator"]["params"]["a"][0]))
    np.testing.assert_allclose(pose500 / pose0, 0.1 ** 0.5, rtol=1e-3)
    # the net group is untouched by the pose-only decay
    np.testing.assert_allclose(np.asarray(last["model_coarse"]["w"]),
                               np.asarray(first["model_coarse"]["w"]), rtol=1e-5)


def test_nan_report_counts():
    from smpl_nerf_tpu.training.solver import nan_report
    tree = {"a": {"kernel": jnp.asarray([1.0, np.nan, np.inf, 2.0])},
            "b": jnp.ones(3), "idx": jnp.arange(3)}
    report = nan_report(tree)
    assert "1 NaN, 1 Inf of 4" in report and "a/kernel" in report
    assert "b" not in report
    assert nan_report({"x": jnp.ones(2)}) == ""


def test_check_nans_raises_with_report(ds):
    """--check_nans: a poisoned run fails fast with the param NaN report."""
    args, _ = _args(ds, check_nans=1, lrate=1e30)  # lr blowup -> NaN params
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "smpl_nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    solver = Solver(pipeline, params, args)
    with pytest.raises(RuntimeError, match="non-finite train loss"):
        solver.train(train_data, train_data)


def test_images_per_batch_eval_overflow_raises(ds):
    """A strided --val_rays batch spanning more than K images must fail LOUDLY
    (the in-step size-K unique set would silently use the wrong vertices)."""
    args, _ = _args(ds, model_type="dummy_dynamic", images_per_batch=2,
                    batchsize_val=128, val_rays=128, warp_radius=0.05)
    args.model_type = "dummy_dynamic"
    args._smpl_model = smpl_mod.procedural_human(rings=3, segments=6)
    train_data = datasets.load_dataset(os.path.join(ds, "train"),
                                       "dummy_dynamic", args)
    val_data = datasets.load_dataset(os.path.join(ds, "val"),
                                     "dummy_dynamic", args)
    extras = {"num_images": train_data.num_images, "betas": train_data.betas,
              "goal_poses": train_data.human_poses,
              "smpl_model": args._smpl_model,
              "num_vertices": args._smpl_model.num_vertices}
    models, params, encoders = build_models_and_params(
        args, jax.random.PRNGKey(0), extras)
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders,
                              extras)
    solver = Solver(pipeline, params, args)
    val_arrays = solver._device_arrays(val_data, "dummy_dynamic")
    # strided indices hit every image: 3 val images > K=2 -> loud failure
    with pytest.raises(ValueError, match="distinct images"):
        solver._validate(val_arrays, val_data.num_rays)


def _build_solver(ds, **overrides):
    args, _ = _args(ds, **overrides)
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "smpl_nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    return Solver(pipeline, params, args), train_data


def test_param_ema_off_by_default(ds):
    solver, _ = _build_solver(ds)
    assert solver.ema_params is None
    assert solver.eval_params is solver.params


def test_param_ema_exact_after_one_step(ds):
    """ema after 1 step == d*init + (1-d)*params, and training is unperturbed."""
    d = 0.5
    vanilla, data = _build_solver(ds, steps_per_epoch=1)
    vanilla.train(data, data)

    ema_solver, data2 = _build_solver(ds, steps_per_epoch=1, param_ema=d)
    init = jax.device_get(build_models_and_params(
        ema_solver.args, jax.random.PRNGKey(0), {})[1])
    ema_solver.train(data2, data2)

    for a, b in zip(jax.tree_util.tree_leaves(ema_solver.params),
                    jax.tree_util.tree_leaves(vanilla.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    want = jax.tree.map(lambda e, p: d * np.asarray(e) + (1 - d) * np.asarray(p),
                        init, jax.device_get(ema_solver.params))
    for a, b in zip(jax.tree_util.tree_leaves(ema_solver.ema_params),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_param_ema_carried_through_scan(ds):
    """decay=1.0: the EMA shadow must stay exactly at init through the fused
    scan path while the raw weights move — catches any dropped/reordered carry."""
    solver, data = _build_solver(ds, steps_per_epoch=4, scan_steps=2,
                                 param_ema=1.0)
    init = jax.device_get(build_models_and_params(
        solver.args, jax.random.PRNGKey(0), {})[1])
    solver.train(data, data)
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(solver.params),
                                jax.tree_util.tree_leaves(init)))
    assert moved
    for a, b in zip(jax.tree_util.tree_leaves(solver.ema_params),
                    jax.tree_util.tree_leaves(init)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    assert solver.eval_params is solver.ema_params


def test_render_rays_batched_image_aligned(ds):
    """render_fn_per_image: batches never mix rays of two images and every
    image gets its own factory call (occupancy per-pose grid contract)."""
    solver, data = _build_solver(ds, batchsize_val=64)
    hw = data.h * data.w
    assert hw % 64 != 0  # the tail batch of each image really is padded
    calls = []

    def per_image(i):
        def fn(params, batch):
            rows = np.unique(np.asarray(batch["image_indices"]))
            calls.append((i, rows))
            return jnp.full((batch["ray_translation"].shape[0], 3), float(i))
        return fn

    out = solver.render_rays_batched(data, render_fn_per_image=per_image)
    assert sorted({c[0] for c in calls}) == list(range(data.num_images))
    for i, rows in calls:
        assert rows.tolist() == [i], (i, rows)
    # every ray of image i got image i's renderer output
    got = out.reshape(data.num_images, hw, 3)
    for i in range(data.num_images):
        np.testing.assert_allclose(got[i], float(i))


def test_foreground_split_white_background_exact():
    from smpl_nerf_tpu.training.solver import foreground_split
    imgs = np.ones((2, 8, 8, 3), np.float32)
    imgs[:, 2:5, 2:5] = 0.3
    is_fg = foreground_split(imgs.reshape(-1, 3), 2, 8, 8, True)
    assert int(is_fg.sum()) == 2 * 9
    assert is_fg.reshape(2, 8, 8)[:, 2:5, 2:5].all()


def test_foreground_split_border_median_per_image():
    """Per-image background estimation handles what the round-2 corner-pixel
    heuristic could not: a different background color per image."""
    from smpl_nerf_tpu.training.solver import foreground_split
    imgs = np.full((2, 8, 8, 3), 0.1, np.float32)
    imgs[1] = 0.6
    imgs[0, 3:5, 3:5] = 0.9
    imgs[1, 3:5, 3:5] = 0.05
    is_fg = foreground_split(imgs.reshape(-1, 3), 2, 8, 8, False)
    assert int(is_fg.sum()) == 2 * 4
    got = is_fg.reshape(2, 8, 8)
    assert got[0, 3:5, 3:5].all() and got[1, 3:5, 3:5].all()


def test_foreground_split_degenerate_disables(capsys):
    """Varied (noisy) backgrounds: the split is declared degenerate instead of
    silently degrading oversampling to noise (original_nerf-style data)."""
    from smpl_nerf_tpu.training.solver import foreground_split
    imgs = np.random.RandomState(0).uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    assert foreground_split(imgs.reshape(-1, 3), 2, 8, 8, False) is None
    assert "degenerate" in capsys.readouterr().out


def test_resume_without_ema_uses_raw_weights(ds, tmp_path, capsys):
    """ADVICE round-2 #2: resuming a --param_ema run WITHOUT --param_ema must
    pair the restored Adam moments with the RAW weights, not the EMA shadow
    that --load_run put into params — and must say so."""
    args, parser = _args(ds, steps_per_epoch=2, param_ema=0.5)
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "smpl_nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    log_dir = str(tmp_path / "run_ema")
    solver = Solver(pipeline, params, args, log_dir=log_dir, parser=parser)
    solver.train(train_data, train_data)

    args2, _ = _args(ds, steps_per_epoch=2)  # no --param_ema
    _, params2, _ = build_models_and_params(args2, jax.random.PRNGKey(7), {})
    restored = checkpoints.load_run(log_dir, params2)  # the EMA shadow
    solver2 = Solver(pipeline, restored, args2)
    assert solver2.ema_params is None
    capsys.readouterr()
    assert solver2.restore_train_state(log_dir)
    assert "param_ema" in capsys.readouterr().out
    for a, b in zip(jax.tree_util.tree_leaves(solver2.params),
                    jax.tree_util.tree_leaves(solver.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # and it keeps training without shape/tree errors
    solver2.train(train_data, train_data)


def test_train_state_save_restore_roundtrip(ds, tmp_path):
    """Optimizer moments + EMA shadow survive a crash/resume cycle exactly."""
    args, parser = _args(ds, steps_per_epoch=2, param_ema=0.5)
    train_data = datasets.load_dataset(os.path.join(ds, "train"), "smpl_nerf", args)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    log_dir = str(tmp_path / "run")
    solver = Solver(pipeline, params, args, log_dir=log_dir, parser=parser)
    solver.train(train_data, train_data)

    # fresh solver, different init -> load weights + train state
    models2, params2, _ = build_models_and_params(args, jax.random.PRNGKey(7), {})
    restored_params = checkpoints.load_run(log_dir, params2)
    solver2 = Solver(pipeline, restored_params, args)
    assert solver2.restore_train_state(log_dir)
    for a, b in zip(jax.tree_util.tree_leaves(solver2.opt_state),
                    jax.tree_util.tree_leaves(solver.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    for a, b in zip(jax.tree_util.tree_leaves(solver2.ema_params),
                    jax.tree_util.tree_leaves(solver.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # --load_run put the EMA shadow into params; restore must swap the RAW
    # training weights back so the moments match their trajectory
    for a, b in zip(jax.tree_util.tree_leaves(solver2.params),
                    jax.tree_util.tree_leaves(solver.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # epoch numbering continues and the pre-crash best-val is protected
    assert solver2.epoch_offset == 1
    assert solver2.best_val == min(solver.history["val_loss"])
    # the restored state steps without recompart errors and keeps training
    solver2.train(train_data, train_data)

    # a config mismatch (different optimizer tree) fails loudly
    args3, _ = _args(ds, steps_per_epoch=2, param_ema=0.5, lrate_decay=100)
    solver3 = Solver(pipeline, restored_params, args3)
    with pytest.raises(ValueError, match="optimizer leaves"):
        solver3.restore_train_state(log_dir)

    # run dirs from before train_state.npz existed degrade gracefully
    os.remove(os.path.join(log_dir, "train_state.npz"))
    assert not Solver(pipeline, restored_params, args).restore_train_state(log_dir)


def test_broadcast_file_single_process(tmp_path):
    """Single-process degenerate case: returns the bytes / None-for-missing."""
    p = tmp_path / "blob.npz"
    np.savez(p, x=np.arange(3))
    data = checkpoints.broadcast_file(str(p))
    assert data == p.read_bytes()
    assert checkpoints.broadcast_file(str(tmp_path / "nope.npz")) is None
    # load_train_state parses broadcast bytes identically to the file path
    import io
    blob = np.load(io.BytesIO(data))
    assert blob["x"].tolist() == [0, 1, 2]


def test_val_split_pose_table_swap(ds):
    """Dynamic-family eval must look poses up in the VAL split's OWN table.

    image_indices are split-local, but the dummy estimator's goal_poses table
    holds the TRAIN split's poses (reference train.py:212,246 builds the
    estimator from train_data.goal_poses and never swaps — val images are
    scored against train-table rows of the same index). swap_pose_table
    replaces the table for validation / rendering; this pins both the
    mechanics and the solver wiring.
    """
    from smpl_nerf_tpu.training.solver import swap_pose_table
    args, _ = _args(ds, model_type="dummy_dynamic", warp_radius=0.05,
                    steps_per_epoch=1)
    args.model_type = "dummy_dynamic"
    args._smpl_model = smpl_mod.procedural_human(rings=3, segments=6)
    train_data = datasets.load_dataset(os.path.join(ds, "train"),
                                       "dummy_dynamic", args)
    val_data = datasets.load_dataset(os.path.join(ds, "val"),
                                     "dummy_dynamic", args)
    extras = {"num_images": train_data.num_images, "betas": train_data.betas,
              "goal_poses": train_data.human_poses,
              "smpl_model": args._smpl_model,
              "num_vertices": args._smpl_model.num_vertices}
    models, params, encoders = build_models_and_params(
        args, jax.random.PRNGKey(0), extras)
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders,
                              extras)
    solver = Solver(pipeline, params, args)

    # mechanics: exactly the table leaf is replaced; estimator.apply on the
    # swapped tree returns the val poses; None / table-less trees are no-ops
    swapped = swap_pose_table(solver.params, val_data.human_poses)
    np.testing.assert_allclose(
        np.asarray(swapped["smpl_estimator"]["constants"]["goal_poses"]),
        val_data.human_poses)
    got = models["smpl_estimator"].apply(
        swapped["smpl_estimator"], jnp.arange(val_data.num_images))
    np.testing.assert_allclose(np.asarray(got), val_data.human_poses)
    assert swapped["model_coarse"] is solver.params["model_coarse"]
    assert swap_pose_table(solver.params, None) is solver.params
    assert swap_pose_table({"model_coarse": {}}, val_data.human_poses) \
        == {"model_coarse": {}}

    # wiring: every _validate call inside train() sees the VAL table while
    # the training weights keep the TRAIN table
    seen = []
    orig_eval = solver._eval_step

    def spy(p, batch, mask):
        seen.append(np.asarray(p["smpl_estimator"]["constants"]["goal_poses"]))
        return orig_eval(p, batch, mask)

    solver._eval_step = spy
    solver.train(train_data, val_data)
    assert seen, "validation never ran"
    for tbl in seen:
        assert tbl.shape[0] == val_data.num_images
        np.testing.assert_allclose(tbl, val_data.human_poses)
    np.testing.assert_allclose(
        np.asarray(solver.params["smpl_estimator"]["constants"]["goal_poses"]),
        train_data.human_poses)

    # render_rays_batched on the val split uses the val table too
    seen_r = []
    orig_render = solver._render_step

    def spy_r(p, batch):
        seen_r.append(np.asarray(p["smpl_estimator"]["constants"]["goal_poses"]))
        return orig_render(p, batch)

    solver._render_step = spy_r
    solver.render_rays_batched(val_data, batch_size=64)
    assert seen_r and all(t.shape[0] == val_data.num_images for t in seen_r)
