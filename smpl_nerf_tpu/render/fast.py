"""Foreground-culled hierarchical rendering — fast novel-view synthesis.

The fine pass (192 samples/ray through the fine MLP) is ~75% of render cost,
but on synthetic human scenes ~95% of rays never hit the subject: their coarse
opacity is ~0 and the fine pass cannot change their color. This renderer runs
the coarse pass on every ray, selects the top-K rays by accumulated opacity
(K static -> shapes stay jit-friendly), runs hierarchical fine sampling + the
fine MLP ONLY on those, and scatters the results back; culled rays keep their
coarse color. Exact for rays with zero coarse weight; the cap is a knob
(default 1/4 of rays, well above typical subject coverage).

Covers the conditioned families too (smpl_nerf warp field, append_to_nerf /
append_smpl_params pose conditioning): conditioning consumes the same rays, so
coarse-opacity culling stays valid — per-ray pose features are gathered along
with the ray. Other families fall back to the full pipeline.

Training always uses the full pipeline; this is a render-path optimization the
reference has no analog of (its inference renders every ray through both MLPs,
inference.py:247-254).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.core.integrate import raw2outputs
from smpl_nerf_tpu.core.sampling import coarse_sampling, fine_sampling
from smpl_nerf_tpu.pipelines import (Pipeline, _make_net_runner, _normalize,
                                     two_joint_pose, warp_field_inputs)

_FAMILIES = ("nerf", "original_nerf", "smpl_nerf", "append_to_nerf",
             "append_smpl_params")


def make_fast_renderer(pipeline: Pipeline, cap_fraction: float = 0.25):
    """Returns render(params, batch) -> rgb [R, 3] with foreground culling."""
    cfg = pipeline.cfg
    if cfg.model_type not in _FAMILIES or not cfg.run_fine:
        def render_fallback(params, batch):
            return pipeline(params, batch, None, False)["rgb_fine"]
        return render_fallback

    run = _make_net_runner(cfg, pipeline.models, pipeline.encoders)
    pose_enc = pipeline.encoders["human_pose"]
    mt = cfg.model_type
    models = pipeline.models

    def _two_joint(batch):
        return two_joint_pose(cfg, batch)

    def _prefix(batch):
        """Per-ray conditioning prefix for the append families, else None."""
        if mt == "append_smpl_params":
            pose = batch["human_pose"]
        elif mt == "append_to_nerf":
            pose = _two_joint(batch)
        else:
            return None
        return pose_enc.encode(pose) if cfg.human_pose_encoding else pose

    def _warp(params, samples, pose2):
        """smpl_nerf warp-field evaluation on [R, S, 3] samples."""
        R, S = samples.shape[:2]
        inputs = warp_field_inputs(cfg, pipeline.encoders, samples, pose2, R, S)
        return models["model_warp_field"].apply(
            params["model_warp_field"], inputs).reshape(R, S, 3)

    def render(params, batch):
        origins = batch["ray_translation"]
        dirs = batch["ray_direction"]
        R = origins.shape[0]
        K = max(1, int(R * cap_fraction))

        samples, z_vals = coarse_sampling(origins, dirs, cfg.near, cfg.far,
                                          cfg.number_coarse_samples, None)
        dirs_exp = jnp.broadcast_to(dirs[:, None, :], samples.shape)
        dirs_unit = _normalize(dirs)[:, None, :]
        prefix = _prefix(batch)
        pose2 = _two_joint(batch) if mt == "smpl_nerf" else None
        if mt == "smpl_nerf":
            warp = _warp(params, samples, pose2)
            warped = samples + warp
            sdirs = warped - origins[:, None, :]
            raw = run("model_coarse", params, warped, _normalize(sdirs))
            out = raw2outputs(raw, z_vals, sdirs, 0.0, cfg.white_background)
        else:
            raw = run("model_coarse", params, samples, dirs_unit, prefix=prefix)
            out = raw2outputs(raw, z_vals, dirs_exp, 0.0, cfg.white_background)

        # top-K foreground rays by accumulated opacity
        _, fg = jax.lax.top_k(out.acc, K)
        take = lambda a: jnp.take(a, fg, axis=0)
        z_fine, samples_fine = fine_sampling(take(origins), take(dirs),
                                             take(z_vals), take(out.weights),
                                             cfg.number_fine_samples, cfg.use_pallas)
        Sf = samples_fine.shape[1]
        dirs_f = jnp.broadcast_to(take(dirs)[:, None, :], (K, Sf, 3))
        if mt == "smpl_nerf":
            warp_f = _warp(params, samples_fine, take(pose2))
            warped_f = samples_fine + warp_f
            fine_dirs = warped_f - take(origins)[:, None, :]
            raw_f = run("model_fine", params, warped_f, _normalize(fine_dirs))
            # fine pass integrates with the UNwarped per-ray direction
            # (smpl_nerf_pipeline.py:95-98)
            out_f = raw2outputs(raw_f, z_fine, dirs_f, 0.0, cfg.white_background)
        else:
            raw_f = run("model_fine", params, samples_fine, take(dirs_unit),
                        prefix=None if prefix is None else take(prefix))
            out_f = raw2outputs(raw_f, z_fine, dirs_f, 0.0, cfg.white_background)
        return out.rgb.at[fg].set(out_f.rgb)

    return render


def make_occupancy_renderer(pipeline: Pipeline, cap_fraction: float = 0.25,
                            grid_resolution: int = 64,
                            aabb=None, n_probe=None,
                            warn_saturation: bool = True,
                            warn_background: bool = True):
    """Occupancy-grid culled renderer: no MLP work at all on background rays.

    make_fast_renderer still runs the coarse MLP on EVERY ray to compute cull
    scores (~half the remaining render cost at 128x128). Here the density
    field is baked into a G^3 voxel grid (ops/occupancy.py) and scores are
    trilinear grid probes, so culled rays cost a few VPU gathers instead of 64
    MLP samples. Selected rays go through the exact standard coarse+fine path;
    culled rays return the background color.

    Returns render(params, batch, grid=None). Pass `grid` (from the returned
    renderer's .build_grid(params, batch)) to amortize the bake across frames
    that share params and body pose; with grid=None it is rebuilt per call
    (G^3 density evals, ~1/4 of one 128x128 coarse pass at G=64).

    Assumes empty space carries ~zero density, which holds for models trained
    with --white_background=1 (the production config for synthetic human
    scenes). A model trained WITHOUT background compositing explains the
    background with a density "curtain"; its grid is occupied everywhere and
    culled rays collapse to the flat background color — use
    make_fast_renderer (graceful coarse-color fallback) for such runs.
    Round-3 guardrails: constructing this renderer for a non-white-background
    config warns; n_probe=None derives the probe count from the near/far span
    and voxel size (occupancy.required_probes); a render whose top-K budget is
    saturated by above-threshold rays prints a loud warning (cli/inference.py
    sizes the budget automatically from probe counts when
    --inf_cap_fraction<=0).
    """
    from smpl_nerf_tpu.ops import occupancy

    cfg = pipeline.cfg
    if aabb is None:
        aabb = occupancy.DEFAULT_AABB
    if n_probe is None:
        n_probe = occupancy.required_probes(aabb, grid_resolution,
                                            cfg.near, cfg.far)
    if cfg.model_type not in _FAMILIES or not cfg.run_fine:
        def render_fallback(params, batch, grid=None):
            return pipeline(params, batch, None, False)["rgb_fine"]
        render_fallback.build_grid = lambda params, batch: None
        render_fallback.ray_scores = lambda grid, origins, dirs: None
        return render_fallback
    # warn_background=False for secondary probe instances (e.g. the
    # cull-budget pre-pass) so the advisory fires once per render call
    if not cfg.white_background and warn_background:
        import warnings
        warnings.warn(
            "make_occupancy_renderer: the run was trained WITHOUT "
            "--white_background — empty space likely carries density, so the "
            "occupancy grid cannot distinguish background and culled rays "
            "collapse to a flat color. Use make_fast_renderer (coarse-color "
            "fallback) for such models.", stacklevel=2)

    run = _make_net_runner(cfg, pipeline.models, pipeline.encoders)
    pose_enc = pipeline.encoders["human_pose"]
    mt = cfg.model_type
    models = pipeline.models

    def _prefix_rows(batch, rows):
        """Conditioning prefix for `rows` lattice rows from the batch's pose."""
        if mt == "append_smpl_params":
            pose = batch["human_pose"][:1]
        elif mt == "append_to_nerf":
            pose = two_joint_pose(cfg, batch)[:1]
        else:
            return None
        feat = pose_enc.encode(pose) if cfg.human_pose_encoding else pose
        return jnp.broadcast_to(feat, (rows, feat.shape[-1]))

    def build_grid(params, batch):
        """Bake the (pose-conditioned) density field into a [G,G,G] grid."""
        def density_fn(pts):
            S = grid_resolution
            rows = pts.shape[0] // S
            samples = pts.reshape(rows, S, 3)
            if mt == "smpl_nerf":
                pose2 = jnp.broadcast_to(two_joint_pose(cfg, batch)[:1],
                                         (rows, 2))
                inputs = warp_field_inputs(cfg, pipeline.encoders, samples,
                                           pose2, rows, S)
                warp = models["model_warp_field"].apply(
                    params["model_warp_field"], inputs).reshape(rows, S, 3)
                samples = samples + warp
            # sigma comes off the trunk before the direction branch
            # (reference render_ray_net.py:28-40) — any unit direction works
            dirs_unit = jnp.broadcast_to(
                jnp.asarray([[[0.0, 0.0, 1.0]]], jnp.float32), (rows, 1, 3))
            raw = run("model_coarse", params, samples, dirs_unit,
                      prefix=_prefix_rows(batch, rows))
            return jax.nn.relu(raw[..., 3].astype(jnp.float32)).reshape(-1)

        return occupancy.build_density_grid(density_fn, aabb, grid_resolution)

    def render(params, batch, grid=None):
        origins = batch["ray_translation"]
        dirs = batch["ray_direction"]
        R = origins.shape[0]
        K = max(1, int(R * cap_fraction))
        if grid is None:
            grid = build_grid(params, batch)

        scores = occupancy.ray_scores(grid, aabb, origins, dirs, cfg.near,
                                      cfg.far, n_probe)
        vals, fg = jax.lax.top_k(scores, K)
        # budget saturation: if even the K-th selected ray is clearly occupied
        # there may be MORE foreground rays than the budget — the round-2
        # silent 1.3 dB narrow-batch loss. Make it loud. The lax.cond +
        # debug.print pair is a HOST CALLBACK inside the jitted program; over
        # the axon tunnel it costs ~2x the whole render (143 vs 57 ms at
        # 128x128), so hot paths (bench, cli/inference — which pre-checks the
        # budget host-side against the derived safe cap) disable it.
        if K < R and warn_saturation:
            jax.lax.cond(
                vals[K - 1] > occupancy.OCC_THRESHOLD,
                lambda: jax.debug.print(
                    "WARNING: occupancy cull budget saturated "
                    f"(K={K} of R={R} rays, cap_fraction={cap_fraction:g}): "
                    "foreground rays may be clipped to background — raise "
                    "cap_fraction (or use auto budgeting / image-scale "
                    "batches)"),
                lambda: None)
        take = lambda a: jnp.take(a, fg, axis=0)

        o_k, d_k = take(origins), take(dirs)
        samples, z_vals = coarse_sampling(o_k, d_k, cfg.near, cfg.far,
                                          cfg.number_coarse_samples, None)
        dirs_exp = jnp.broadcast_to(d_k[:, None, :], samples.shape)
        dirs_unit = _normalize(d_k)[:, None, :]
        prefix_all = None
        if mt in ("append_smpl_params", "append_to_nerf"):
            pose = (batch["human_pose"] if mt == "append_smpl_params"
                    else two_joint_pose(cfg, batch))
            prefix_all = (pose_enc.encode(pose) if cfg.human_pose_encoding
                          else pose)
        prefix = None if prefix_all is None else take(prefix_all)
        pose2 = take(two_joint_pose(cfg, batch)) if mt == "smpl_nerf" else None

        def _warp(samples_k):
            Rk, Sk = samples_k.shape[:2]
            inputs = warp_field_inputs(cfg, pipeline.encoders, samples_k,
                                       pose2, Rk, Sk)
            return models["model_warp_field"].apply(
                params["model_warp_field"], inputs).reshape(Rk, Sk, 3)

        if mt == "smpl_nerf":
            warped = samples + _warp(samples)
            sdirs = warped - o_k[:, None, :]
            raw = run("model_coarse", params, warped, _normalize(sdirs))
            out = raw2outputs(raw, z_vals, sdirs, 0.0, cfg.white_background)
        else:
            raw = run("model_coarse", params, samples, dirs_unit, prefix=prefix)
            out = raw2outputs(raw, z_vals, dirs_exp, 0.0, cfg.white_background)

        z_fine, samples_fine = fine_sampling(o_k, d_k, z_vals, out.weights,
                                             cfg.number_fine_samples,
                                             cfg.use_pallas)
        Sf = samples_fine.shape[1]
        dirs_f = jnp.broadcast_to(d_k[:, None, :], (K, Sf, 3))
        if mt == "smpl_nerf":
            warped_f = samples_fine + _warp(samples_fine)
            fine_dirs = warped_f - o_k[:, None, :]
            raw_f = run("model_fine", params, warped_f, _normalize(fine_dirs))
            out_f = raw2outputs(raw_f, z_fine, dirs_f, 0.0, cfg.white_background)
        else:
            raw_f = run("model_fine", params, samples_fine, dirs_unit,
                        prefix=prefix)
            out_f = raw2outputs(raw_f, z_fine, dirs_f, 0.0, cfg.white_background)

        bg = 1.0 if cfg.white_background else 0.0
        canvas = jnp.full((R, 3), bg, out_f.rgb.dtype)
        return canvas.at[fg].set(out_f.rgb)

    render.build_grid = build_grid
    # scoring hook for cull-budget derivation: callers (cli/inference.py auto
    # cap) probe each batch's rays against a baked grid and size K from the
    # count of scores above render.threshold
    render.ray_scores = lambda grid, origins, dirs: occupancy.ray_scores(
        grid, aabb, origins, dirs, cfg.near, cfg.far, n_probe)
    render.threshold = occupancy.OCC_THRESHOLD
    return render
