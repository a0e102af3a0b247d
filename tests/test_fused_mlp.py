"""Fused-MLP kernel vs the flax RenderRayNet and jnp reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.models import RenderRayNet
from smpl_nerf_tpu.ops import fused_mlp


@pytest.mark.parametrize("add_dim,use_dir,skips", [(0, True, (4,)), (40, True, (4,)),
                                                   (0, False, (2,))])
def test_fused_matches_flax(add_dim, use_dir, skips, rng):
    spec = fused_mlp.MlpSpec(n_layers=8, width=256, positions_dim=60,
                             directions_dim=24, additional_input_dim=add_dim,
                             skips=skips, use_directional_input=use_dir)
    model = RenderRayNet(n_layers=8, width=256, positions_dim=60, directions_dim=24,
                         additional_input_dim=add_dim, skips=skips,
                         use_directional_input=use_dir, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(300, spec.in_dim).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    got = np.asarray(fused_mlp.fused_apply(spec, params, x))
    # both paths compute in bf16; small accumulated differences are expected
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_reference_forward_matches_flax(rng):
    spec = fused_mlp.MlpSpec()
    model = RenderRayNet(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(64, spec.in_dim).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(params, x))
    flat = fused_mlp.flatten_params(spec, params)
    got = np.asarray(fused_mlp.reference_forward(spec, flat, x))
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_fused_gradients_match_flax(rng):
    spec = fused_mlp.MlpSpec(n_layers=3, width=64, positions_dim=12,
                             directions_dim=6, skips=(1,))
    model = RenderRayNet(n_layers=3, width=64, positions_dim=12, directions_dim=6,
                         skips=(1,), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(32, spec.in_dim).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss_flax(p):
        return jnp.mean(model.apply(p, x) ** 2)

    def loss_fused(p):
        return jnp.mean(fused_mlp.fused_apply(spec, p, x) ** 2)

    g_flax = jax.grad(loss_flax)(params)
    g_fused = jax.grad(loss_fused)(params)
    flat_a = jax.tree_util.tree_leaves(g_flax)
    flat_b = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.02, rtol=0.1)


def test_fused_handles_nonmultiple_batch(rng):
    spec = fused_mlp.MlpSpec(n_layers=2, width=32, positions_dim=12, directions_dim=6,
                             skips=())
    model = RenderRayNet(n_layers=2, width=32, positions_dim=12, directions_dim=6,
                         skips=(), dtype=jnp.bfloat16)
    x = jnp.asarray(rng.randn(7, spec.in_dim).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    got = np.asarray(fused_mlp.fused_apply(spec, params, x))
    assert got.shape == (7, 4)
    want = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
