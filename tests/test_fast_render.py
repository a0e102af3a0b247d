"""Foreground-culled renderer == full pipeline where it matters."""
import numpy as np

import jax
import jax.numpy as jnp

from smpl_nerf_tpu import config as config_mod
from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
from smpl_nerf_tpu.render.fast import make_fast_renderer
from smpl_nerf_tpu.training.factory import build_models_and_params


def _make(run_fine=1, model_type="nerf", **extra_flags):
    parser = config_mod.config_parser()
    argv = [
        "--config=/dev/null", f"--model_type={model_type}", "--netdepth=2",
        "--netwidth=16", f"--run_fine={run_fine}", "--number_coarse_samples=8",
        "--number_fine_samples=8", "--sigma_noise_std=0", "--use_pallas=0",
        "--netwidth_warp=8", "--number_frequencies_pose=2",
        "--number_frequencies_postitional=2", "--number_frequencies_directional=1"]
    argv += [f"--{k}={v}" for k, v in extra_flags.items()]
    args = parser.parse_args(argv)
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    return pipeline, params


def _batch(rng, n=64, with_pose=False):
    origins = np.tile(np.asarray([[0, 0, 2.4]], np.float32), (n, 1))
    dirs = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    dirs[:, 2] = -1
    batch = {"ray_translation": jnp.asarray(origins),
             "ray_direction": jnp.asarray(dirs),
             "rgb": jnp.zeros((n, 3))}
    if with_pose:
        pose = np.zeros((n, 69), np.float32)
        pose[:, 38] = rng.uniform(-0.5, 0.5, n)
        pose[:, 41] = rng.uniform(-0.5, 0.5, n)
        batch["human_pose"] = jnp.asarray(pose)
    return batch


def test_fast_render_matches_full_on_top_rays(rng):
    pipeline, params = _make()
    batch = _batch(rng)
    full = np.asarray(pipeline(params, batch, None, False)["rgb_fine"])
    fast = np.asarray(make_fast_renderer(pipeline, cap_fraction=1.0)(params, batch))
    # cap=100%: every ray goes through the fine pass -> identical to full
    np.testing.assert_allclose(fast, full, atol=1e-5)


def test_fast_render_culled_stays_close(rng):
    pipeline, params = _make()
    batch = _batch(rng)
    full = np.asarray(pipeline(params, batch, None, False)["rgb_fine"])
    fast = np.asarray(make_fast_renderer(pipeline, cap_fraction=0.5)(params, batch))
    # the un-culled half matches exactly; culled rays fall back to coarse color,
    # which for a random net stays within a loose bound
    diff = np.abs(fast - full).max(-1)
    assert np.median(diff) < 1e-5


def test_fast_render_fallback_for_coarse_only(rng):
    pipeline, params = _make(run_fine=0)
    batch = _batch(rng)
    render = make_fast_renderer(pipeline)
    out = np.asarray(render(params, batch))
    want = np.asarray(pipeline(params, batch, None, False)["rgb_fine"])
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_fast_render_smpl_nerf_matches_full(rng):
    """cap=100% on the warp-field family == the full conditioned pipeline."""
    pipeline, params = _make(model_type="smpl_nerf", human_pose_encoding=1)
    batch = _batch(rng, with_pose=True)
    full = np.asarray(pipeline(params, batch, None, False)["rgb_fine"])
    fast = np.asarray(make_fast_renderer(pipeline, cap_fraction=1.0)(params, batch))
    np.testing.assert_allclose(fast, full, atol=1e-5)


def test_fast_render_append_smpl_params_matches_full(rng):
    pipeline, params = _make(model_type="append_smpl_params",
                             human_pose_encoding=1)
    batch = _batch(rng, with_pose=True)
    full = np.asarray(pipeline(params, batch, None, False)["rgb_fine"])
    fast = np.asarray(make_fast_renderer(pipeline, cap_fraction=1.0)(params, batch))
    np.testing.assert_allclose(fast, full, atol=1e-5)


def test_fast_render_append_to_nerf_matches_full(rng):
    pipeline, params = _make(model_type="append_to_nerf", human_pose_encoding=1)
    batch = _batch(rng, with_pose=True)
    full = np.asarray(pipeline(params, batch, None, False)["rgb_fine"])
    fast = np.asarray(make_fast_renderer(pipeline, cap_fraction=1.0)(params, batch))
    np.testing.assert_allclose(fast, full, atol=1e-5)


def test_fast_render_smpl_nerf_culled_selected_exact(rng):
    """Culled conditioned render: the K selected (top-opacity) rays are exact.

    A random warp net gives nonzero density everywhere, so CULLED rays may
    differ from the full render (their fine pass is skipped by design); the
    guarantee is that the K fine-rendered rays match the full pipeline.
    """
    pipeline, params = _make(model_type="smpl_nerf", human_pose_encoding=1)
    batch = _batch(rng, with_pose=True)
    full = np.asarray(pipeline(params, batch, None, False)["rgb_fine"])
    fast = np.asarray(make_fast_renderer(pipeline, cap_fraction=0.5)(params, batch))
    diff = np.abs(fast - full).max(-1)
    K = 32
    assert (diff < 1e-5).sum() >= K
