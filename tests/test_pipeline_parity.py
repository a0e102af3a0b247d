"""Whole-pipeline numerical parity vs a torch oracle of the reference math.

Builds the reference NeRF pipeline (encode -> coarse MLP -> alpha-composite ->
deterministic inverse-CDF fine sampling -> fine MLP -> composite) in torch from
the reference formulas (nerf_pipeline.py:14-67, utils.py:114-264), shares the
weights with our jnp pipeline via the torch-import shim, and requires the final
pixel colors to agree. This is the integration-level guarantee behind the
PSNR-parity claim: every op in the render chain matches, not just units.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from smpl_nerf_tpu import config as config_mod
from smpl_nerf_tpu.models import RenderRayNet
from smpl_nerf_tpu.models import render_ray_net as rrn_mod
from smpl_nerf_tpu.pipelines import RenderConfig, build_encoders, build_pipeline


def _torch_encoder(L):
    freqs = torch.pow(2, torch.linspace(0., L - 1, L))

    def enc(x):
        outs = []
        for f in freqs:
            outs.append(torch.sin(x * f))
            outs.append(torch.cos(x * f))
        return torch.cat(outs, -1)

    return enc


def _torch_raw2outputs(raw, z_vals, dirs, white_background):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * torch.norm(dirs, dim=-1)
    rgb = torch.sigmoid(raw[..., :3])
    density = 1. - torch.exp(-F.relu(raw[..., 3]) * dists)
    one_minus = 1. - density + 1e-10
    ones = torch.ones_like(one_minus[..., :1])
    weights = density * torch.cumprod(torch.cat([ones, one_minus[..., :-1]], -1), -1)
    out = torch.sum(weights[..., None] * rgb, -2)
    if white_background:
        out = out + (1. - weights.sum(-1)[..., None])
    return out, weights


def _torch_sample_pdf(bins, weights, n_fine):
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0., 1., n_fine).expand(list(cdf.shape[:-1]) + [n_fine])
    inds = torch.searchsorted(cdf.contiguous(), u.contiguous(), right=True)
    below = torch.clamp(inds - 1, min=0)
    above = torch.clamp(inds, max=cdf.shape[-1] - 1)
    inds_g = torch.stack([below, above], -1)
    matched = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(matched), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


@pytest.mark.parametrize("white_background", [False, True])
def test_full_nerf_pipeline_matches_torch_oracle(white_background, rng):
    pos_L, dir_L = 4, 2
    n_layers, width = 3, 32
    S_c, S_f = 8, 16
    near, far = 1.0, 4.0
    R = 12

    # shared weights: torch modules -> our params
    from tests.test_models import _torch_render_ray_net
    t_coarse = _torch_render_ray_net(n_layers, width, 3 * 2 * pos_L, 3 * 2 * dir_L,
                                     0, [1], 1)
    t_fine = _torch_render_ray_net(n_layers, width, 3 * 2 * pos_L, 3 * 2 * dir_L,
                                   0, [1], 1)
    to_np = lambda net: {k: v.numpy() for k, v in net.state_dict().items()}

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=nerf", f"--netdepth={n_layers}",
        f"--netwidth={width}", "--skips=1", f"--netdepth_fine={n_layers}",
        f"--netwidth_fine={width}", "--skips_fine=1", "--run_fine=1",
        f"--number_coarse_samples={S_c}", f"--number_fine_samples={S_f}",
        f"--number_frequencies_postitional={pos_L}",
        f"--number_frequencies_directional={dir_L}", "--sigma_noise_std=0",
        f"--white_background={int(white_background)}", f"--near={near}",
        f"--far={far}", "--use_pallas=0"])
    encoders = build_encoders(args)
    models = {
        "model_coarse": RenderRayNet(n_layers=n_layers, width=width,
                                     positions_dim=3 * 2 * pos_L,
                                     directions_dim=3 * 2 * dir_L, skips=(1,)),
        "model_fine": RenderRayNet(n_layers=n_layers, width=width,
                                   positions_dim=3 * 2 * pos_L,
                                   directions_dim=3 * 2 * dir_L, skips=(1,)),
    }
    params = {
        "model_coarse": rrn_mod.import_torch_state_dict(to_np(t_coarse), n_layers),
        "model_fine": rrn_mod.import_torch_state_dict(to_np(t_fine), n_layers),
    }
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})

    origins = np.tile(np.asarray([[0, 0, 2.4]], np.float32), (R, 1))
    dirs = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32)
    dirs[:, 2] = -1.0

    # eval mode: deterministic jitter 0.5 -> same z_vals both sides
    batch = {"ray_translation": jnp.asarray(origins), "ray_direction": jnp.asarray(dirs),
             "rgb": jnp.zeros((R, 3))}
    out = pipeline(params, batch, None, False)

    # ---- torch oracle (reference nerf_pipeline.py:14-67 semantics) ----
    t = np.linspace(0, 1, S_c, dtype=np.float64)
    z = 1.0 / (1.0 / near * (1 - t) + 1.0 / far * t)
    mids = 0.5 * (z[1:] + z[:-1])
    upper = np.concatenate([mids, z[-1:]])
    lower = np.concatenate([z[:1], mids])
    z_vals = torch.tensor((lower + (upper - lower) * 0.5)[None].repeat(R, 0),
                          dtype=torch.float32)
    to = torch.from_numpy(origins)
    td = torch.from_numpy(dirs)
    samples = to[:, None] + td[:, None] * z_vals[..., None]
    penc, denc = _torch_encoder(pos_L), _torch_encoder(dir_L)
    dirs_exp = td[:, None, :].expand(R, S_c, 3)
    dirs_norm = dirs_exp / torch.norm(dirs_exp, dim=-1, keepdim=True)
    de = denc(dirs_norm)
    inp = torch.cat([penc(samples).view(R * S_c, -1), de.reshape(R * S_c, -1)], -1)
    raw = t_coarse(inp).view(R, S_c, 4)
    rgb_c, weights = _torch_raw2outputs(raw, z_vals, dirs_exp, white_background)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = _torch_sample_pdf(z_mid, weights[..., 1:-1], S_f).detach()
    z_all, _ = torch.sort(torch.cat([z_vals, z_fine], -1), -1)
    samples_f = to[:, None] + td[:, None] * z_all[..., None]
    Sf_all = S_c + S_f
    de_f = de[:, :1, :].expand(R, Sf_all, de.shape[-1])
    inp_f = torch.cat([penc(samples_f).view(R * Sf_all, -1),
                       de_f.reshape(R * Sf_all, -1)], -1)
    raw_f = t_fine(inp_f).view(R, Sf_all, 4)
    dirs_f = td[:, None, :].expand(R, Sf_all, 3)
    rgb_f, _ = _torch_raw2outputs(raw_f, z_all, dirs_f, white_background)

    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]),
                               rgb_c.detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]),
                               rgb_f.detach().numpy(), atol=2e-3)


@pytest.mark.parametrize("human_pose_encoding,white_background",
                         [(1, True), (0, False)])
def test_smpl_nerf_warp_pipeline_matches_torch_oracle(human_pose_encoding,
                                                      white_background, rng):
    """The eponymous warp-field pipeline vs a torch transliteration of
    reference smpl_nerf_pipeline.py:16-100: 2-joint pose -> warp MLP ->
    warped re-encode -> per-sample coarse directions -> composite; fine pass
    re-warps but composites with the UNwarped ray direction (the reference's
    own quirk, smpl_nerf_pipeline.py:95-98)."""
    import torch.nn as tnn

    from smpl_nerf_tpu.models import warp_field_net as wfn_mod
    from smpl_nerf_tpu.models.warp_field_net import WarpFieldNet
    from tests.test_models import _torch_render_ray_net

    pos_L, dir_L, pose_L = 4, 2, 3
    n_layers, width, w_warp = 3, 32, 16
    S_c, S_f = 8, 16
    near, far = 1.0, 4.0
    R = 12

    pos_dim, dir_dim = 3 * 2 * pos_L, 3 * 2 * dir_L
    pose_dim = 2 * 2 * pose_L if human_pose_encoding else 2
    warp_in_dim = (pos_dim if human_pose_encoding else 3) + pose_dim

    t_coarse = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim, 0, [1], 1)
    t_fine = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim, 0, [1], 1)

    class TWarp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear1 = tnn.Linear(warp_in_dim, w_warp)
            self.linear2 = tnn.Linear(w_warp, 3)

        def forward(self, x):
            return self.linear2(F.relu(self.linear1(x)))

    t_warp = TWarp()
    to_np = lambda net: {k: v.numpy() for k, v in net.state_dict().items()}

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=smpl_nerf",
        f"--human_pose_encoding={human_pose_encoding}",
        f"--netdepth={n_layers}", f"--netwidth={width}", "--skips=1",
        f"--netdepth_fine={n_layers}", f"--netwidth_fine={width}",
        "--skips_fine=1", "--run_fine=1", f"--netwidth_warp={w_warp}",
        f"--number_coarse_samples={S_c}", f"--number_fine_samples={S_f}",
        f"--number_frequencies_postitional={pos_L}",
        f"--number_frequencies_directional={dir_L}",
        f"--number_frequencies_pose={pose_L}", "--sigma_noise_std=0",
        f"--white_background={int(white_background)}", f"--near={near}",
        f"--far={far}", "--use_pallas=0"])
    encoders = build_encoders(args)
    mk = lambda: RenderRayNet(n_layers=n_layers, width=width,
                              positions_dim=pos_dim, directions_dim=dir_dim,
                              skips=(1,))
    models = {
        "model_coarse": mk(), "model_fine": mk(),
        "model_warp_field": WarpFieldNet(width=w_warp,
                                         positions_dim=pos_dim,
                                         pose_dim=pose_dim),
    }
    params = {
        "model_coarse": rrn_mod.import_torch_state_dict(to_np(t_coarse), n_layers),
        "model_fine": rrn_mod.import_torch_state_dict(to_np(t_fine), n_layers),
        "model_warp_field": wfn_mod.import_torch_state_dict(to_np(t_warp)),
    }
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})

    origins = np.tile(np.asarray([[0, 0, 2.4]], np.float32), (R, 1))
    dirs = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32)
    dirs[:, 2] = -1.0
    pose69 = rng.uniform(-0.5, 0.5, (R, 69)).astype(np.float32)

    batch = {"ray_translation": jnp.asarray(origins),
             "ray_direction": jnp.asarray(dirs),
             "human_pose": jnp.asarray(pose69), "rgb": jnp.zeros((R, 3))}
    out = pipeline(params, batch, None, False)

    # ---- torch oracle --------------------------------------------------
    t = np.linspace(0, 1, S_c, dtype=np.float64)
    z = 1.0 / (1.0 / near * (1 - t) + 1.0 / far * t)
    mids = 0.5 * (z[1:] + z[:-1])
    upper = np.concatenate([mids, z[-1:]])
    lower = np.concatenate([z[:1], mids])
    z_vals = torch.tensor((lower + (upper - lower) * 0.5)[None].repeat(R, 0),
                          dtype=torch.float32)
    to = torch.from_numpy(origins)
    td = torch.from_numpy(dirs)
    tp = torch.from_numpy(pose69)
    pose2 = torch.stack([tp[:, 38], tp[:, 41]], -1)
    penc, denc = _torch_encoder(pos_L), _torch_encoder(dir_L)
    posenc = _torch_encoder(pose_L)

    def warp_inputs(samples, S):
        if human_pose_encoding:
            pe = posenc(pose2)[:, None, :].expand(R, S, pose_dim)
            se = penc(samples)
            return torch.cat([se.reshape(R * S, -1), pe.reshape(R * S, -1)], -1)
        pe = pose2[:, None, :].expand(R, S, 2)
        return torch.cat([samples.reshape(R * S, -1), pe.reshape(R * S, -1)], -1)

    samples = to[:, None] + td[:, None] * z_vals[..., None]
    warp = t_warp(warp_inputs(samples, S_c)).view(R, S_c, 3)
    warped = samples + warp
    samples_dirs = warped - to[:, None, :]
    dirs_norm = samples_dirs / torch.norm(samples_dirs, dim=-1, keepdim=True)
    inp = torch.cat([penc(warped).view(R * S_c, -1),
                     denc(dirs_norm).reshape(R * S_c, -1)], -1)
    raw = t_coarse(inp).view(R, S_c, 4)
    rgb_c, weights = _torch_raw2outputs(raw, z_vals, samples_dirs,
                                        white_background)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = _torch_sample_pdf(z_mid, weights[..., 1:-1], S_f).detach()
    z_all, _ = torch.sort(torch.cat([z_vals, z_fine], -1), -1)
    Sf_all = S_c + S_f
    samples_f = to[:, None] + td[:, None] * z_all[..., None]
    warp_f = t_warp(warp_inputs(samples_f, Sf_all)).view(R, Sf_all, 3)
    warped_f = samples_f + warp_f
    fine_dirs = warped_f - to[:, None, :]
    fine_norm = fine_dirs / torch.norm(fine_dirs, dim=-1, keepdim=True)
    inp_f = torch.cat([penc(warped_f).view(R * Sf_all, -1),
                       denc(fine_norm).reshape(R * Sf_all, -1)], -1)
    raw_f = t_fine(inp_f).view(R, Sf_all, 4)
    dirs_f = td[:, None, :].expand(R, Sf_all, 3)  # UNwarped (reference quirk)
    rgb_f, _ = _torch_raw2outputs(raw_f, z_all, dirs_f, white_background)

    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]),
                               rgb_c.detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["warp"]).reshape(R, Sf_all, 3),
                               warp_f.detach().numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]),
                               rgb_f.detach().numpy(), atol=2e-3)


@pytest.mark.parametrize("model_type,human_pose_encoding,white_background", [
    ("append_smpl_params", 1, True),   # the flagship config: full 69-dim pose
    ("append_to_nerf", 0, False),      # 2-joint, raw (unencoded) pose append
])
def test_append_pipeline_matches_torch_oracle(model_type, human_pose_encoding,
                                              white_background, rng):
    """Pose-append families vs a torch transliteration of reference
    append_to_nerf_pipeline.py:14-90 / append_smpl_params_pipeline.py:
    inputs are [pose_enc | sample_enc | dir_enc] (pose rides the MLP's
    additional_input_dim slot); the fine pass reuses the first sample's
    direction encoding and composites with the expanded ray direction."""
    from tests.test_models import _torch_render_ray_net

    pos_L, dir_L, pose_L = 4, 2, 2
    n_layers, width = 3, 32
    S_c, S_f = 8, 16
    near, far = 1.0, 4.0
    R = 12

    pose_raw_dim = 69 if model_type == "append_smpl_params" else 2
    pos_dim, dir_dim = 3 * 2 * pos_L, 3 * 2 * dir_L
    add_dim = pose_raw_dim * 2 * pose_L if human_pose_encoding else pose_raw_dim

    t_coarse = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim,
                                     add_dim, [1], 1)
    t_fine = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim,
                                   add_dim, [1], 1)
    to_np = lambda net: {k: v.numpy() for k, v in net.state_dict().items()}

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", f"--model_type={model_type}",
        f"--human_pose_encoding={human_pose_encoding}",
        f"--netdepth={n_layers}", f"--netwidth={width}", "--skips=1",
        f"--netdepth_fine={n_layers}", f"--netwidth_fine={width}",
        "--skips_fine=1", "--run_fine=1",
        f"--number_coarse_samples={S_c}", f"--number_fine_samples={S_f}",
        f"--number_frequencies_postitional={pos_L}",
        f"--number_frequencies_directional={dir_L}",
        f"--number_frequencies_pose={pose_L}", "--sigma_noise_std=0",
        f"--white_background={int(white_background)}", f"--near={near}",
        f"--far={far}", "--use_pallas=0"])
    encoders = build_encoders(args)
    mk = lambda: RenderRayNet(n_layers=n_layers, width=width,
                              positions_dim=pos_dim, directions_dim=dir_dim,
                              additional_input_dim=add_dim, skips=(1,))
    models = {"model_coarse": mk(), "model_fine": mk()}
    params = {
        "model_coarse": rrn_mod.import_torch_state_dict(to_np(t_coarse), n_layers),
        "model_fine": rrn_mod.import_torch_state_dict(to_np(t_fine), n_layers),
    }
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})

    origins = np.tile(np.asarray([[0, 0, 2.4]], np.float32), (R, 1))
    dirs = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32)
    dirs[:, 2] = -1.0
    pose69 = rng.uniform(-0.5, 0.5, (R, 69)).astype(np.float32)

    batch = {"ray_translation": jnp.asarray(origins),
             "ray_direction": jnp.asarray(dirs),
             "human_pose": jnp.asarray(pose69), "rgb": jnp.zeros((R, 3))}
    out = pipeline(params, batch, None, False)

    # ---- torch oracle --------------------------------------------------
    t = np.linspace(0, 1, S_c, dtype=np.float64)
    z = 1.0 / (1.0 / near * (1 - t) + 1.0 / far * t)
    mids = 0.5 * (z[1:] + z[:-1])
    upper = np.concatenate([mids, z[-1:]])
    lower = np.concatenate([z[:1], mids])
    z_vals = torch.tensor((lower + (upper - lower) * 0.5)[None].repeat(R, 0),
                          dtype=torch.float32)
    to = torch.from_numpy(origins)
    td = torch.from_numpy(dirs)
    tp = torch.from_numpy(pose69)
    pose = (tp if model_type == "append_smpl_params"
            else torch.stack([tp[:, 38], tp[:, 41]], -1))
    penc, denc = _torch_encoder(pos_L), _torch_encoder(dir_L)
    pose_flat = _torch_encoder(pose_L)(pose) if human_pose_encoding else pose

    samples = to[:, None] + td[:, None] * z_vals[..., None]
    dirs_exp = td[:, None, :].expand(R, S_c, 3)
    dirs_norm = dirs_exp / torch.norm(dirs_exp, dim=-1, keepdim=True)
    de = denc(dirs_norm)
    pe = pose_flat[:, None, :].expand(R, S_c, add_dim)
    inp = torch.cat([pe.reshape(R * S_c, -1), penc(samples).view(R * S_c, -1),
                     de.reshape(R * S_c, -1)], -1)
    raw = t_coarse(inp).view(R, S_c, 4)
    rgb_c, weights = _torch_raw2outputs(raw, z_vals, dirs_exp, white_background)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = _torch_sample_pdf(z_mid, weights[..., 1:-1], S_f).detach()
    z_all, _ = torch.sort(torch.cat([z_vals, z_fine], -1), -1)
    Sf_all = S_c + S_f
    samples_f = to[:, None] + td[:, None] * z_all[..., None]
    pe_f = pose_flat[:, None, :].expand(R, Sf_all, add_dim)
    de_f = de[:, :1, :].expand(R, Sf_all, de.shape[-1])
    inp_f = torch.cat([pe_f.reshape(R * Sf_all, -1),
                       penc(samples_f).view(R * Sf_all, -1),
                       de_f.reshape(R * Sf_all, -1)], -1)
    raw_f = t_fine(inp_f).view(R, Sf_all, 4)
    dirs_f = td[:, None, :].expand(R, Sf_all, 3)
    rgb_f, _ = _torch_raw2outputs(raw_f, z_all, dirs_f, white_background)

    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]),
                               rgb_c.detach().numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]),
                               rgb_f.detach().numpy(), atol=2e-3)


def _mk_nets_and_pipeline(model_type, rng_seed, pos_L, dir_L, n_layers, width,
                          S_c, white_background, extra_args=()):
    from tests.test_models import _torch_render_ray_net
    pos_dim, dir_dim = 3 * 2 * pos_L, 3 * 2 * dir_L
    torch.manual_seed(rng_seed)
    t_net = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim, 0, [1], 1)
    to_np = lambda net: {k: v.numpy() for k, v in net.state_dict().items()}
    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", f"--model_type={model_type}",
        f"--netdepth={n_layers}", f"--netwidth={width}", "--skips=1",
        f"--number_coarse_samples={S_c}", "--run_fine=0",
        f"--number_frequencies_postitional={pos_L}",
        f"--number_frequencies_directional={dir_L}", "--sigma_noise_std=0",
        f"--white_background={int(white_background)}", "--use_pallas=0",
        *extra_args])
    encoders = build_encoders(args)
    models = {"model_coarse": RenderRayNet(
        n_layers=n_layers, width=width, positions_dim=3 * 2 * pos_L,
        directions_dim=3 * 2 * dir_L, skips=(1,))}
    params = {"model_coarse": rrn_mod.import_torch_state_dict(
        to_np(t_net), n_layers)}
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
    return t_net, pipeline, params


def test_single_sample_smpl_pipeline_matches_torch_oracle(rng):
    """'smpl' family vs reference singe_sample_pipeline.py:17-40: one surface
    sample per ray, warped, direction from the warped sample, sigmoid RGB."""
    pos_L, dir_L, n_layers, width, R = 4, 2, 3, 32, 20
    t_net, pipeline, params = _mk_nets_and_pipeline("smpl", 7, pos_L, dir_L,
                                                    n_layers, width, 8, False)
    origins = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    samples = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    warp = (rng.uniform(-0.1, 0.1, (R, 3))).astype(np.float32)
    batch = {"ray_translation": jnp.asarray(origins),
             "ray_samples": jnp.asarray(samples), "warp": jnp.asarray(warp),
             "rgb": jnp.zeros((R, 3))}
    out = pipeline(params, batch, None, False)

    to, ts, tw = map(torch.from_numpy, (origins, samples, warp))
    warped = ts + tw
    direction = warped - to
    dn = direction / torch.norm(direction, dim=-1, keepdim=True)
    penc, denc = _torch_encoder(pos_L), _torch_encoder(dir_L)
    raw = t_net(torch.cat([penc(warped), denc(dn)], -1))
    want = torch.sigmoid(raw[..., :3])
    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]),
                               want.detach().numpy(), atol=1e-5)


def test_vertex_sphere_pipeline_matches_torch_oracle(rng):
    """vertex_sphere vs reference vertex_sphere_pipeline.py:15-50: precomputed
    gt warps added to given samples, per-sample warped directions, composite
    (fine pass is NotImplemented in the reference — coarse-only contract)."""
    pos_L, dir_L, n_layers, width, R, S = 4, 2, 3, 32, 14, 8
    t_net, pipeline, params = _mk_nets_and_pipeline(
        "vertex_sphere", 11, pos_L, dir_L, n_layers, width, S, True)
    origins = np.tile(np.asarray([[0, 0, 2.4]], np.float32), (R, 1))
    z_vals = np.sort(rng.uniform(1, 4, (R, S)).astype(np.float32), -1)
    dirs = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32)
    dirs[:, 2] = -1.0
    samples = origins[:, None] + dirs[:, None] * z_vals[..., None]
    warp = rng.uniform(-0.05, 0.05, (R, S, 3)).astype(np.float32)
    batch = {"ray_translation": jnp.asarray(origins),
             "ray_direction": jnp.asarray(dirs),
             "ray_samples": jnp.asarray(samples.astype(np.float32)),
             "z_vals": jnp.asarray(z_vals), "warp": jnp.asarray(warp),
             "rgb": jnp.zeros((R, 3))}
    out = pipeline(params, batch, None, False)

    to = torch.from_numpy(origins)
    ts = torch.from_numpy(samples.astype(np.float32))
    tw = torch.from_numpy(warp)
    tz = torch.from_numpy(z_vals)
    warped = ts + tw
    sdirs = warped - to[:, None, :]
    dn = sdirs / torch.norm(sdirs, dim=-1, keepdim=True)
    penc, denc = _torch_encoder(pos_L), _torch_encoder(dir_L)
    inp = torch.cat([penc(warped).view(R * S, -1),
                     denc(dn).reshape(R * S, -1)], -1)
    raw = t_net(inp).view(R, S, 4)
    want, _ = _torch_raw2outputs(raw, tz, sdirs, True)
    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]),
                               want.detach().numpy(), atol=2e-4)


def test_supervised_warp_pipeline_matches_torch_oracle(rng):
    """'warp' family vs reference warp training inputs (warp_solver.py:31-43 /
    smpl_nerf_pipeline's warp-input layout): warp MLP on [sample_enc|pose_enc]."""
    import torch.nn as tnn

    from smpl_nerf_tpu.models import warp_field_net as wfn_mod
    from smpl_nerf_tpu.models.warp_field_net import WarpFieldNet

    pos_L, pose_L, w_warp, R = 4, 3, 16, 20
    pos_dim, pose_dim = 3 * 2 * pos_L, 2 * 2 * pose_L

    torch.manual_seed(5)

    class TWarp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear1 = tnn.Linear(pos_dim + pose_dim, w_warp)
            self.linear2 = tnn.Linear(w_warp, 3)

        def forward(self, x):
            return self.linear2(F.relu(self.linear1(x)))

    t_warp = TWarp()
    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=warp", "--human_pose_encoding=1",
        f"--netwidth_warp={w_warp}", f"--number_frequencies_postitional={pos_L}",
        f"--number_frequencies_pose={pose_L}", "--use_pallas=0"])
    encoders = build_encoders(args)
    models = {"model_warp_field": WarpFieldNet(width=w_warp,
                                               positions_dim=pos_dim,
                                               pose_dim=pose_dim)}
    params = {"model_warp_field": wfn_mod.import_torch_state_dict(
        {k: v.numpy() for k, v in t_warp.state_dict().items()})}
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders, {})

    samples = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    pose69 = rng.uniform(-0.5, 0.5, (R, 69)).astype(np.float32)
    batch = {"ray_samples": jnp.asarray(samples),
             "human_pose": jnp.asarray(pose69), "rgb": jnp.zeros((R, 3))}
    out = pipeline(params, batch, None, False)

    tp = torch.from_numpy(pose69)
    pose2 = torch.stack([tp[:, 38], tp[:, 41]], -1)
    inp = torch.cat([_torch_encoder(pos_L)(torch.from_numpy(samples)),
                     _torch_encoder(pose_L)(pose2)], -1)
    want = t_warp(inp).detach().numpy()
    np.testing.assert_allclose(np.asarray(out["warp"]), want, atol=1e-5)


# --------------------------------------------------------------- dynamic

def _lbs_oracle(model, betas, body_pose):
    """Independent numpy/scipy LBS oracle of the standard SMPL equations.

    Mirrors what the reference delegates to smplx.lbs (driven per-ray by
    dynamic_pipeline.py:45-51): shape blendshapes -> rest joints -> rodrigues
    per joint (scipy, NOT our rodrigues) -> forward-kinematics chain ->
    rest-joint removal -> linear blend skinning. float64 throughout.
    """
    from scipy.spatial.transform import Rotation

    betas = np.asarray(betas, np.float64).reshape(-1)
    nb = min(len(betas), model.shapedirs.shape[-1])
    v = model.v_template.astype(np.float64) + np.einsum(
        "vcb,b->vc", model.shapedirs[..., :nb].astype(np.float64), betas[:nb])
    if model.rest_joints is not None:
        joints = model.rest_joints.astype(np.float64)
    else:
        joints = model.joint_regressor.astype(np.float64) @ v
    full_pose = np.concatenate([np.zeros((1, 3)),
                                np.asarray(body_pose, np.float64).reshape(23, 3)], 0)
    rots = Rotation.from_rotvec(full_pose).as_matrix()          # [24, 3, 3]
    if model.posedirs.size:
        pf = (rots[1:] - np.eye(3)).reshape(-1)
        v = v + np.einsum("vcp,p->vc", model.posedirs.astype(np.float64), pf)
    A = np.zeros((24, 4, 4))
    for j in range(24):
        p = model.parents[j]
        rel = np.eye(4)
        rel[:3, :3] = rots[j]
        rel[:3, 3] = joints[j] - (joints[p] if p >= 0 else 0.0)
        A[j] = A[p] @ rel if p >= 0 else rel
    G = A.copy()
    G[:, :3, 3] -= np.einsum("jrc,jc->jr", A[:, :3, :3], joints)
    T = np.einsum("vj,jrc->vrc", model.lbs_weights.astype(np.float64), G)
    v_h = np.concatenate([v, np.ones((len(v), 1))], 1)
    return np.einsum("vrc,vc->vr", T, v_h)[:, :3]


@pytest.mark.parametrize("images_per_batch,single_image", [
    (0, False),   # full pose-table lookup
    (2, False),   # unique-image production path, both slots used
    (2, True),    # all rays on ONE image: exercises the jnp.unique
                  # fill_value=-1 padding branch of _goal_verts_table
])
def test_dynamic_pipeline_matches_torch_oracle(images_per_batch, single_image,
                                               rng):
    """dummy_dynamic vs the reference dynamic chain (dynamic_pipeline.py:40-83):
    per-image estimator pose lookup -> SMPL LBS -> canonical-minus-goal warp
    vectors -> modified-softmax vertex attention -> warped NeRF composite.
    Whole chain with shared MLP weights; LBS via an independent scipy oracle,
    attention via the dense numpy oracle, composite via the torch oracle.
    Covers both lookup paths: full-table (K=0) and unique-image (K=2,
    the --images_per_batch production path).
    """
    from smpl_nerf_tpu.models import smpl as smpl_mod
    from smpl_nerf_tpu.models.dummy_estimators import DummySmplEstimatorModel
    from tests.test_models import _torch_render_ray_net
    from tests.test_ops import _attention_oracle

    pos_L, dir_L, n_layers, width, R, S = 4, 2, 3, 32, 10, 6
    n_img, radius, temp = 4, 0.35, 40.0
    human = smpl_mod.procedural_human(rings=3, segments=6)
    betas = np.zeros(10, np.float32)
    goal_poses = (0.25 * rng.randn(n_img, 69)).astype(np.float32)

    torch.manual_seed(13)
    pos_dim, dir_dim = 3 * 2 * pos_L, 3 * 2 * dir_L
    t_net = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim, 0, [1], 1)
    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=dummy_dynamic",
        f"--netdepth={n_layers}", f"--netwidth={width}", "--skips=1",
        f"--number_coarse_samples={S}", "--run_fine=0",
        f"--number_frequencies_postitional={pos_L}",
        f"--number_frequencies_directional={dir_L}", "--sigma_noise_std=0",
        "--white_background=1", "--use_pallas=0",
        f"--warp_radius={radius}", f"--warp_temperature={temp}",
        f"--images_per_batch={images_per_batch}"])
    encoders = build_encoders(args)
    models = {
        "model_coarse": RenderRayNet(n_layers=n_layers, width=width,
                                     positions_dim=pos_dim, directions_dim=dir_dim,
                                     skips=(1,)),
        "smpl_estimator": DummySmplEstimatorModel(goal_poses=goal_poses,
                                                  betas=betas),
    }
    params = {
        "model_coarse": rrn_mod.import_torch_state_dict(
            {k: v.numpy() for k, v in t_net.state_dict().items()}, n_layers),
        "smpl_estimator": models["smpl_estimator"].init(
            jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32)),
    }
    extras = {"smpl_model": human, "betas": betas, "num_images": n_img}
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders,
                              extras)

    # rays through the body: origins on a circle, samples near goal vertices
    # (so the attention warp is active), ascending z_vals
    if single_image:
        image_indices = np.full(R, 1, np.int32)
    else:
        image_indices = rng.randint(0, 2 if images_per_batch else n_img, R)
    goal_verts_np = np.stack([_lbs_oracle(human, betas, goal_poses[i])
                              for i in range(n_img)])          # [N, V, 3]
    canonical_np = _lbs_oracle(human, betas, np.zeros(69))
    origins = np.tile(np.asarray([[0.0, 0.0, 2.4]], np.float32), (R, 1))
    anchor = goal_verts_np[image_indices, rng.randint(0, human.num_vertices, R)]
    samples = (anchor[:, None, :]
               + 0.1 * rng.randn(R, S, 3)).astype(np.float32)  # [R, S, 3]
    z_vals = np.sort(rng.uniform(1.0, 4.0, (R, S)).astype(np.float32), -1)

    batch = {"ray_translation": jnp.asarray(origins),
             "ray_direction": jnp.zeros((R, 3), jnp.float32),
             "ray_samples": jnp.asarray(samples),
             "z_vals": jnp.asarray(z_vals),
             "image_indices": jnp.asarray(image_indices, jnp.int32),
             "rgb": jnp.zeros((R, 3))}
    out = pipeline(params, batch, None, False)

    # ---- oracle chain -----------------------------------------------------
    ray_verts = goal_verts_np[image_indices].astype(np.float32)    # [R, V, 3]
    ray_warps = (canonical_np[None] - goal_verts_np)[image_indices].astype(
        np.float32)
    warp = _attention_oracle(samples.astype(np.float64),
                             ray_verts.astype(np.float64),
                             ray_warps.astype(np.float64), radius, temp)
    np.testing.assert_allclose(np.asarray(out["warp"]), warp, atol=2e-4)

    warped = torch.from_numpy((samples + warp).astype(np.float32))
    sdirs = warped - torch.from_numpy(origins)[:, None, :]
    dn = sdirs / torch.norm(sdirs, dim=-1, keepdim=True)
    penc, denc = _torch_encoder(pos_L), _torch_encoder(dir_L)
    inp = torch.cat([penc(warped).view(R * S, -1), denc(dn).reshape(R * S, -1)], -1)
    raw = t_net(inp).view(R, S, 4)
    want, _ = _torch_raw2outputs(raw, torch.from_numpy(z_vals), sdirs, True)
    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]),
                               want.detach().numpy(), atol=5e-4)


# ------------------------------------------------- append_vertex_locations

@pytest.mark.parametrize("images_per_batch,single_image", [
    (0, False),   # full pose-table lookup
    (2, False),   # unique-image production path, both slots used
    (2, True),    # all rays on ONE image: exercises the jnp.unique
                  # fill_value=-1 padding branch of _goal_verts_table
])
def test_append_vertices_pipeline_matches_torch_oracle(images_per_batch,
                                                       single_image, rng):
    """append_vertex_locations_to_nerf vs the reference chain
    (append_vertices_pipeline.py:29-58 + append_vertices_net.py:30-33):
    per-image estimator pose lookup -> SMPL LBS -> flattened goal-vertex
    cloud -> embedding MLP -> [emb | pos_enc | dir_enc] trunk -> composite,
    plus the hierarchical fine pass reusing the per-ray embedding. LBS via
    the independent scipy oracle; embedding via a float64 numpy
    re-expression; trunk/composite/inverse-CDF via the torch oracle.
    (The reference net computes the embedding and DROPS it — a documented
    dead branch; we test the intended, effective conditioning.)
    """
    from smpl_nerf_tpu.models import smpl as smpl_mod
    from smpl_nerf_tpu.models.dummy_estimators import DummySmplEstimatorModel
    from smpl_nerf_tpu.training.factory import VertexEmbedder
    from tests.test_models import _torch_render_ray_net

    pos_L, dir_L, n_layers, width = 4, 2, 3, 32
    S_c, S_f, R, n_img, emb_dim = 6, 8, 10, 4, 8
    near, far = 1.0, 4.0
    human = smpl_mod.procedural_human(rings=3, segments=6)
    betas = np.zeros(10, np.float32)
    goal_poses = (0.25 * rng.randn(n_img, 69)).astype(np.float32)

    torch.manual_seed(7)
    pos_dim, dir_dim = 3 * 2 * pos_L, 3 * 2 * dir_L
    t_coarse = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim,
                                     emb_dim, [1], 1)
    t_fine = _torch_render_ray_net(n_layers, width, pos_dim, dir_dim,
                                   emb_dim, [1], 1)
    to_np = lambda net: {k: v.numpy() for k, v in net.state_dict().items()}

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", "--model_type=append_vertex_locations_to_nerf",
        f"--netdepth={n_layers}", f"--netwidth={width}", "--skips=1",
        f"--netdepth_fine={n_layers}", f"--netwidth_fine={width}",
        "--skips_fine=1", "--run_fine=1",
        f"--number_coarse_samples={S_c}", f"--number_fine_samples={S_f}",
        f"--number_frequencies_postitional={pos_L}",
        f"--number_frequencies_directional={dir_L}", "--sigma_noise_std=0",
        "--white_background=1", f"--near={near}", f"--far={far}",
        "--use_pallas=0", f"--images_per_batch={images_per_batch}"])
    encoders = build_encoders(args)
    mk = lambda: RenderRayNet(n_layers=n_layers, width=width,
                              positions_dim=pos_dim, directions_dim=dir_dim,
                              additional_input_dim=emb_dim, skips=(1,))
    models = {
        "model_coarse": mk(), "model_fine": mk(),
        "smpl_estimator": DummySmplEstimatorModel(goal_poses=goal_poses,
                                                  betas=betas),
        "vertex_embedder": VertexEmbedder(width=width, embedding_dim=emb_dim),
    }
    V = human.num_vertices
    params = {
        "model_coarse": rrn_mod.import_torch_state_dict(to_np(t_coarse), n_layers),
        "model_fine": rrn_mod.import_torch_state_dict(to_np(t_fine), n_layers),
        "smpl_estimator": models["smpl_estimator"].init(
            jax.random.PRNGKey(0), jnp.zeros((1,), jnp.int32)),
        "vertex_embedder": models["vertex_embedder"].init(
            jax.random.PRNGKey(1), jnp.zeros((1, V * 3))),
    }
    extras = {"smpl_model": human, "betas": betas, "num_images": n_img}
    pipeline = build_pipeline(RenderConfig.from_args(args), models, encoders,
                              extras)

    origins = np.tile(np.asarray([[0.0, 0.0, 2.4]], np.float32), (R, 1))
    dirs = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32)
    dirs[:, 2] = -1.0
    if single_image:
        image_indices = np.full(R, 3, np.int64)
    else:
        image_indices = rng.randint(0, 2 if images_per_batch else n_img, R)

    batch = {"ray_translation": jnp.asarray(origins),
             "ray_direction": jnp.asarray(dirs),
             "image_indices": jnp.asarray(image_indices, jnp.int32),
             "rgb": jnp.zeros((R, 3))}
    out = pipeline(params, batch, None, False)

    # ---- oracle chain ------------------------------------------------------
    goal_verts_np = np.stack([_lbs_oracle(human, betas, goal_poses[i])
                              for i in range(n_img)])            # [N, V, 3]
    verts_flat = goal_verts_np[image_indices].reshape(R, V * 3)
    ep = params["vertex_embedder"]["params"]
    emb = np.maximum(verts_flat @ np.asarray(ep["embed_0"]["kernel"], np.float64)
                     + np.asarray(ep["embed_0"]["bias"], np.float64), 0.0)
    emb = np.maximum(emb @ np.asarray(ep["embed_out"]["kernel"], np.float64)
                     + np.asarray(ep["embed_out"]["bias"], np.float64), 0.0)
    emb_t = torch.from_numpy(emb.astype(np.float32))             # [R, emb_dim]

    t = np.linspace(0, 1, S_c, dtype=np.float64)
    z = 1.0 / (1.0 / near * (1 - t) + 1.0 / far * t)
    mids = 0.5 * (z[1:] + z[:-1])
    upper = np.concatenate([mids, z[-1:]])
    lower = np.concatenate([z[:1], mids])
    z_vals = torch.tensor((lower + (upper - lower) * 0.5)[None].repeat(R, 0),
                          dtype=torch.float32)
    to = torch.from_numpy(origins)
    td = torch.from_numpy(dirs)
    penc, denc = _torch_encoder(pos_L), _torch_encoder(dir_L)
    dn = (td / torch.norm(td, dim=-1, keepdim=True))[:, None, :]  # [R, 1, 3]

    samples = to[:, None] + td[:, None] * z_vals[..., None]
    dirs_exp = td[:, None, :].expand(R, S_c, 3)
    de = denc(dn).expand(R, S_c, dir_dim)
    pe = emb_t[:, None, :].expand(R, S_c, emb_dim)
    inp = torch.cat([pe.reshape(R * S_c, -1), penc(samples).view(R * S_c, -1),
                     de.reshape(R * S_c, -1)], -1)
    raw = t_coarse(inp).view(R, S_c, 4)
    rgb_c, weights = _torch_raw2outputs(raw, z_vals, dirs_exp, True)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_fine = _torch_sample_pdf(z_mid, weights[..., 1:-1], S_f).detach()
    z_all, _ = torch.sort(torch.cat([z_vals, z_fine], -1), -1)
    Sf_all = S_c + S_f
    samples_f = to[:, None] + td[:, None] * z_all[..., None]
    pe_f = emb_t[:, None, :].expand(R, Sf_all, emb_dim)
    de_f = denc(dn).expand(R, Sf_all, dir_dim)
    inp_f = torch.cat([pe_f.reshape(R * Sf_all, -1),
                       penc(samples_f).view(R * Sf_all, -1),
                       de_f.reshape(R * Sf_all, -1)], -1)
    raw_f = t_fine(inp_f).view(R, Sf_all, 4)
    dirs_f = td[:, None, :].expand(R, Sf_all, 3)
    rgb_f, _ = _torch_raw2outputs(raw_f, z_all, dirs_f, True)

    np.testing.assert_allclose(np.asarray(out["rgb_coarse"]),
                               rgb_c.detach().numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]),
                               rgb_f.detach().numpy(), atol=2e-3)
