"""Fused MLP v2 (in-kernel encoding + fused backward) vs jnp oracles.

Kernels run interpret=True off-TPU (conftest forces CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.core.encoding import PositionalEncoder
from smpl_nerf_tpu.models import RenderRayNet
from smpl_nerf_tpu.ops import fused_mlp, fused_mlp_v2


def _spec_and_params(rng, n_layers=3, width=32, pos_f=4, dir_f=2, add=0,
                     skips=(1,)):
    spec = fused_mlp.MlpSpec(
        n_layers=n_layers, width=width, positions_dim=6 * pos_f,
        directions_dim=6 * dir_f, additional_input_dim=add, skips=skips,
        use_directional_input=True, dtype="float32")
    model = RenderRayNet(n_layers=n_layers, width=width,
                         positions_dim=6 * pos_f, directions_dim=6 * dir_f,
                         additional_input_dim=add, skips=skips)
    x_enc = jnp.zeros((2, 6 * pos_f + add + 6 * dir_f))
    params = model.init(jax.random.PRNGKey(0), x_enc)
    return spec, model, params


def _raw_batch(rng, n, add):
    pre = rng.randn(n, add).astype(np.float32) if add else np.zeros((n, 0), np.float32)
    p3 = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d3 = rng.randn(n, 3).astype(np.float32)
    d3 /= np.linalg.norm(d3, axis=-1, keepdims=True)
    return np.concatenate([pre, p3, d3], -1)


def test_encoding_matrices_match_positional_encoder(rng):
    # tolerance scales with the max frequency: sin(2^(L-1) x + pi/2) vs
    # cos(2^(L-1) x) differ by ~ulp(2^(L-1) x) in float32 — identical math,
    # different rounding path
    for L, atol in ((1, 1e-6), (4, 1e-6), (10, 3e-4)):
        M, P = fused_mlp_v2.encoding_matrices(3, L)
        x = rng.randn(7, 3).astype(np.float32)
        got = np.sin(x @ M + P)
        want = np.asarray(PositionalEncoder(L, False).encode(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("add", [0, 8])
def test_v2_forward_matches_encode_then_mlp(rng, add):
    """v2(raw rows) == PositionalEncoder + the flax net on encoded rows."""
    spec, model, params = _spec_and_params(rng, add=add)
    x_raw = _raw_batch(rng, 50, add)
    got = np.asarray(fused_mlp_v2.fused_apply_raw(spec, params, jnp.asarray(x_raw)))

    pos_enc = PositionalEncoder(spec.positions_dim // 6, False)
    dir_enc = PositionalEncoder(spec.directions_dim // 6, False)
    pre = x_raw[:, :add]
    pe = np.asarray(pos_enc.encode(jnp.asarray(x_raw[:, add:add + 3])))
    de = np.asarray(dir_enc.encode(jnp.asarray(x_raw[:, add + 3:])))
    x_enc = jnp.asarray(np.concatenate([pre, pe, de], -1))
    want = np.asarray(model.apply(params, x_enc))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_v2_forward_matches_reference_raw(rng):
    spec, _, params = _spec_and_params(rng)
    flat = fused_mlp.flatten_params(spec, params)
    x_raw = jnp.asarray(_raw_batch(rng, 2050, 0))  # forces multi-tile + padding
    got = np.asarray(fused_mlp_v2.fused_apply_raw(spec, params, x_raw))
    want = np.asarray(fused_mlp_v2.reference_forward_raw(spec, flat, x_raw))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("add", [0, 8])
def test_v2_fused_backward_matches_jnp_grads(rng, add):
    """The fused backward kernel (VMEM dW accumulation over >1 grid steps)
    reproduces d/dparams and d/dx of the jnp reference, including gradients
    through the in-kernel encoding (warp fields need d/d sample)."""
    spec, _, params = _spec_and_params(rng, add=add)
    flat = fused_mlp.flatten_params(spec, params)
    n = 2 * fused_mlp_v2._TILE_BWD + 37  # 3 grid steps incl. a padded tail
    x_raw = jnp.asarray(_raw_batch(rng, n, add))
    t = jnp.asarray(rng.rand(n, 4).astype(np.float32))

    def loss_fused(flat, x):
        out = fused_mlp_v2._fused_mlp_v2(spec, flat, x)
        return jnp.sum((out - t) ** 2)

    def loss_ref(flat, x):
        out = fused_mlp_v2.reference_forward_raw(spec, flat, x)
        return jnp.sum((out - t) ** 2)

    g_flat, g_x = jax.grad(loss_fused, argnums=(0, 1))(flat, x_raw)
    w_flat, w_x = jax.grad(loss_ref, argnums=(0, 1))(flat, x_raw)
    for a, b in zip(g_flat, w_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(w_x),
                               atol=5e-3, rtol=1e-3)


def test_v2_supports_gate():
    spec, _, _ = (None, None, None)
    s = fused_mlp.MlpSpec(positions_dim=24, directions_dim=12)
    assert fused_mlp_v2.supports(s, PositionalEncoder(4, False),
                                 PositionalEncoder(2, False))
    assert not fused_mlp_v2.supports(s, PositionalEncoder(4, True),
                                     PositionalEncoder(2, False))
    assert not fused_mlp_v2.supports(s, PositionalEncoder(3, False),
                                     PositionalEncoder(2, False))


def _pipeline_with(rng, use_fused_mlp, model_type="nerf", extra=()):
    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.training.factory import build_models_and_params

    parser = config_mod.config_parser()
    args = parser.parse_args([
        "--config=/dev/null", f"--model_type={model_type}", "--netdepth=3",
        "--netwidth=32", "--skips=1", "--netdepth_fine=3", "--netwidth_fine=32",
        "--skips_fine=1", "--run_fine=1", "--number_coarse_samples=8",
        "--number_fine_samples=8", "--sigma_noise_std=0", "--use_pallas=0",
        "--number_frequencies_postitional=4", "--number_frequencies_directional=2",
        f"--use_fused_mlp={use_fused_mlp}", *extra])
    models, params, encoders = build_models_and_params(args, jax.random.PRNGKey(0), {})
    return build_pipeline(RenderConfig.from_args(args), models, encoders, {}), params


@pytest.mark.parametrize("model_type,extra", [
    ("nerf", ()),
    ("append_smpl_params", ("--human_pose_encoding=1", "--number_frequencies_pose=2")),
])
def test_v2_pipeline_matches_plain(rng, model_type, extra):
    """Whole coarse+fine pipeline with --use_fused_mlp=2 == plain XLA path."""
    p0, params = _pipeline_with(rng, 0, model_type, extra)
    p2, _ = _pipeline_with(rng, 2, model_type, extra)
    n = 24
    origins = np.tile(np.asarray([[0, 0, 2.4]], np.float32), (n, 1))
    dirs = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    dirs[:, 2] = -1
    batch = {"ray_translation": jnp.asarray(origins),
             "ray_direction": jnp.asarray(dirs),
             "rgb": jnp.zeros((n, 3))}
    if model_type != "nerf":
        pose = np.zeros((n, 69), np.float32)
        pose[:, 38] = rng.uniform(-0.5, 0.5, n)
        batch["human_pose"] = jnp.asarray(pose)
    out0 = p0(params, batch, None, False)
    out2 = p2(params, batch, None, False)
    np.testing.assert_allclose(np.asarray(out2["rgb_coarse"]),
                               np.asarray(out0["rgb_coarse"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out2["rgb_fine"]),
                               np.asarray(out0["rgb_fine"]), atol=2e-4)


def test_vmem_feasibility_bound():
    """v2 self-bounds to widths whose weights + dW accumulators fit scoped
    VMEM: W=256 (the reference net) passes, W>=384 is rejected — and
    build_pipeline surfaces the width-specific error, not the encoder one."""
    import pytest

    from smpl_nerf_tpu.ops.fused_mlp import MlpSpec
    from smpl_nerf_tpu.ops.fused_mlp_v2 import vmem_feasible

    assert vmem_feasible(MlpSpec(width=256))
    assert not vmem_feasible(MlpSpec(width=384))
    assert not vmem_feasible(MlpSpec(width=1024))

    import jax

    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.training.factory import build_models_and_params
    p = config_mod.config_parser()
    args = p.parse_args(["--config=/dev/null", "--model_type=nerf",
                         "--dataset_dir=x", "--netwidth=1024",
                         "--netwidth_fine=1024", "--use_fused_mlp=2"])
    models, params, enc = build_models_and_params(args, jax.random.PRNGKey(0), {})
    with pytest.raises(ValueError, match="scoped-VMEM"):
        build_pipeline(RenderConfig.from_args(args), models, enc, {})


def test_resolve_fused_mode_auto(rng):
    """--use_fused_mlp=-1 policy: v2 only on TPU when the kernel supports the
    net/encoder combo; plain XLA everywhere else (incl. big widths + identity
    encoders)."""
    from smpl_nerf_tpu.pipelines import resolve_fused_mode_auto

    spec, _, _ = _spec_and_params(rng)
    pe = PositionalEncoder(4, False)
    de = PositionalEncoder(2, False)
    assert resolve_fused_mode_auto(spec, pe, de, "cpu") == 0
    assert resolve_fused_mode_auto(spec, pe, de, "tpu") == 2
    # identity encoders: v2's in-kernel sin(x@M+P) form can't express them
    pe_id = PositionalEncoder(4, True)
    assert resolve_fused_mode_auto(spec, pe_id, de, "tpu") == 0
    # W=1024: VMEM-infeasible backward -> plain XLA (also measured fastest)
    big = fused_mlp.MlpSpec(n_layers=8, width=1024, positions_dim=24,
                            directions_dim=12, additional_input_dim=0,
                            skips=(4,), use_directional_input=True,
                            dtype="float32")
    assert resolve_fused_mode_auto(big, pe, de, "tpu") == 0
    # conditioning prefix (append families): v2's raw-row advantage is gone
    # and the round-4 flagship A/B measured it ~18% slower e2e -> plain XLA
    pref = fused_mlp.MlpSpec(n_layers=8, width=256, positions_dim=24,
                             directions_dim=12, additional_input_dim=621,
                             skips=(4,), use_directional_input=True,
                             dtype="float32")
    assert resolve_fused_mode_auto(pref, pe, de, "tpu") == 0


def test_auto_mode_builds_plain_pipeline_on_cpu(rng):
    """use_fused_mlp=-1 through the full pipeline builder on CPU == mode 0."""
    from smpl_nerf_tpu import config as config_mod
    from smpl_nerf_tpu.pipelines import RenderConfig, build_pipeline
    from smpl_nerf_tpu.training.factory import build_models_and_params

    argv = ["--config=/dev/null", "--model_type=nerf", "--netdepth=2",
            "--netwidth=16", "--number_coarse_samples=4", "--run_fine=0",
            "--number_frequencies_postitional=4",
            "--number_frequencies_directional=2", "--sigma_noise_std=0",
            "--use_pallas=0", "--batchsize=8"]
    outs = []
    for mode in ("0", "-1"):
        args = config_mod.config_parser().parse_args(
            argv + [f"--use_fused_mlp={mode}"])
        models, params, encoders = build_models_and_params(
            args, jax.random.PRNGKey(0))
        pipe = build_pipeline(RenderConfig.from_args(args), models, encoders, {})
        batch = {
            "ray_translation": jnp.zeros((8, 3)) + jnp.asarray([0.0, 0.0, 2.0]),
            "ray_direction": jnp.asarray(
                np.random.RandomState(0).uniform(-0.2, 0.2, (8, 3)).astype(np.float32)),
            "rgb": jnp.zeros((8, 3)),
        }
        outs.append(np.asarray(pipe(params, batch, None, False)["rgb_coarse"]))
    np.testing.assert_allclose(outs[0], outs[1], atol=0)
