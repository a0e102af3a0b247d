"""Pipeline-parallel trunk (parallel/pp.py) on the 8-virtual-device CPU mesh:
forward equality vs the dense stacked trunk AND vs the real flax RenderRayNet,
gradient parity through the pipeline, identity-padding, and bubble schedules
(n_micro = 1 .. N)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.models.render_ray_net import RenderRayNet
from smpl_nerf_tpu.parallel import mesh as mesh_mod
from smpl_nerf_tpu.parallel import pp

W, D, DIR = 16, 6, 4


def _net_and_params(n_layers=8, skips=(4,), use_dir=True, seed=0):
    net = RenderRayNet(n_layers=n_layers, width=W, positions_dim=D,
                       directions_dim=DIR, skips=skips,
                       use_directional_input=use_dir)
    x = jnp.asarray(np.random.RandomState(seed).randn(8, D + DIR), jnp.float32)
    params = net.init(jax.random.PRNGKey(seed), x)
    return net, params


def test_stacked_trunk_dense_matches_flax_full_net(rng, devices):
    """pp_render_ray_net on a 1-stage mesh == RenderRayNet.apply bit-for-bit
    math (trunk restacking is exact, heads are the same dense chain)."""
    net, params = _net_and_params()
    mesh = mesh_mod.make_mesh("8,1")
    x = jnp.asarray(rng.randn(32, D + DIR).astype(np.float32))
    want = net.apply(params, x)
    got = pp.pp_render_ray_net(mesh, params, x, n_layers=8, width=W,
                               pos_dim=D, dir_dim=DIR, skips=(4,),
                               n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("n_stages", [2, 4, 8])
@pytest.mark.parametrize("n_micro", [1, 4, 16])
def test_pipeline_trunk_matches_dense(rng, devices, n_stages, n_micro):
    mesh = mesh_mod.make_mesh(f"{8 // n_stages},{n_stages}")
    _, params = _net_and_params()
    kernels, biases, use_x = pp.stack_trunk(params, 8, (4,), D, W,
                                            n_stages=n_stages)
    assert kernels.shape[0] % n_stages == 0
    x = jnp.asarray(rng.randn(16, D).astype(np.float32))
    want = pp.trunk_dense(kernels, biases, use_x, x)
    got = pp.pipeline_trunk(mesh, kernels, biases, use_x, x, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_identity_padding_is_exact(rng, devices):
    """6 trunk layers on 4 stages -> 2 identity pad layers; output unchanged."""
    _, params = _net_and_params(n_layers=6, skips=(2,))
    k1, b1, u1 = pp.stack_trunk(params, 6, (2,), D, W, n_stages=1)
    k4, b4, u4 = pp.stack_trunk(params, 6, (2,), D, W, n_stages=4)
    assert k1.shape[0] == 6 and k4.shape[0] == 8
    x = jnp.asarray(rng.randn(8, D).astype(np.float32))
    np.testing.assert_allclose(np.asarray(pp.trunk_dense(k4, b4, u4, x)),
                               np.asarray(pp.trunk_dense(k1, b1, u1, x)),
                               atol=1e-6)
    mesh = mesh_mod.make_mesh("2,4")
    got = pp.pipeline_trunk(mesh, k4, b4, u4, x, n_micro=2)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(pp.trunk_dense(k1, b1, u1, x)),
                               atol=1e-5)


def test_full_net_over_4_stages_matches_flax(rng, devices):
    net, params = _net_and_params()
    mesh = mesh_mod.make_mesh("2,4")
    x = jnp.asarray(rng.randn(24, D + DIR).astype(np.float32))
    want = net.apply(params, x)
    got = pp.pp_render_ray_net(mesh, params, x, n_layers=8, width=W,
                               pos_dim=D, dir_dim=DIR, skips=(4,), n_micro=6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_flow_through_pipeline(rng, devices):
    """jax.grad through shard_map+ppermute+scan matches the dense-path grads
    wrt the ORIGINAL flax params (stack_trunk is jnp, so grads flow back)."""
    net, params = _net_and_params()
    mesh = mesh_mod.make_mesh("2,4")
    x = jnp.asarray(rng.randn(16, D + DIR).astype(np.float32))
    tgt = jnp.asarray(rng.rand(16, 4).astype(np.float32))

    def loss_pp(p):
        out = pp.pp_render_ray_net(mesh, p, x, n_layers=8, width=W,
                                   pos_dim=D, dir_dim=DIR, skips=(4,),
                                   n_micro=4)
        return jnp.mean((out - tgt) ** 2)

    def loss_dense(p):
        return jnp.mean((net.apply(p, x) - tgt) ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_dense = jax.grad(loss_dense)(params)
    flat_pp, _ = jax.tree_util.tree_flatten_with_path(g_pp)
    flat_dn = dict(jax.tree_util.tree_flatten_with_path(g_dense)[0])
    # every leaf has a nonzero dense grad somewhere; pipeline must match all
    checked = 0
    for path, leaf in flat_pp:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_dn[path]),
                                   atol=1e-5, err_msg=str(path))
        checked += 1
    assert checked == len(flat_dn) and checked > 0


def test_pipeline_trunk_shape_guards(rng, devices):
    mesh = mesh_mod.make_mesh("2,4")
    _, params = _net_and_params()
    k, b, u = pp.stack_trunk(params, 8, (4,), D, W, n_stages=1)
    x = jnp.asarray(rng.randn(16, D).astype(np.float32))
    with pytest.raises(ValueError, match="not divisible"):
        pp.pipeline_trunk(mesh, k, b, u, x, n_micro=3)   # 16 % 3
    k7 = k[:7]
    with pytest.raises(ValueError, match="stages"):
        pp.pipeline_trunk(mesh, k7, b[:7], u[:7], x, n_micro=4)
