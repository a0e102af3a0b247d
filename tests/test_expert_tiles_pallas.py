"""Oracle tests for the fused sorted-tile expert kernel
(ops/expert_tiles_pallas.py) against the jnp tiled path it replaces
(parallel/ep.tiles_apply + render/experts._encode). Interpret mode off-TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smpl_nerf_tpu.parallel import ep
from smpl_nerf_tpu.render import experts as ex
from smpl_nerf_tpu.ops.expert_tiles_pallas import expert_tiles_forward


def _field(key, grid=3, hidden=16, l_pos=3, l_dir=1):
    E = grid ** 3
    D = ex.encoded_dim(l_pos, l_dir)
    ks = jax.random.split(key, 4)
    experts = ep.ExpertMLP(
        w0=jax.random.normal(ks[0], (E, D, hidden)) * 0.3,
        b0=jax.random.normal(ks[1], (E, hidden)) * 0.1,
        w1=jax.random.normal(ks[2], (E, hidden, 4)) * 0.3,
        b1=jax.random.normal(ks[3], (E, 4)) * 0.1)
    return ex.ExpertField(experts, jnp.array([-1.0, -1.0, -1.0]),
                          jnp.array([1.0, 1.0, 1.0]), grid, l_pos, l_dir)


@pytest.mark.parametrize("tile", [8, 32])
def test_kernel_matches_jnp_tiles(tile):
    field = _field(jax.random.PRNGKey(0))
    N, budget = 300, 512 if tile == 8 else 608
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (N, 3), minval=-1.2, maxval=1.2)
    dirs = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    ids, n_route = ex._route(field, pos)
    plan = ep.sorted_tile_plan(ids, n_route, budget, tile)
    want = ep.tiles_apply(field.experts,
                          ex._encode(field, pos[plan.tok], dirs[plan.tok]),
                          plan)
    got = expert_tiles_forward(field.experts,
                               ex._local_coords(field, pos[plan.tok]),
                               dirs[plan.tok], plan.valid, plan.tile_expert,
                               l_pos=field.l_pos, l_dir=field.l_dir,
                               tile=tile)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_raw_fn_kernel_path_matches_jnp_path():
    field = _field(jax.random.PRNGKey(3), grid=2, hidden=8)
    N = 200
    pos = jax.random.uniform(jax.random.PRNGKey(4), (N, 3),
                             minval=-1.5, maxval=1.5)  # some out-of-AABB
    dirs = jax.random.normal(jax.random.PRNGKey(5), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    raw_j, over_j = ex.expert_raw_fn_tiled(field, pos, dirs, budget=384,
                                           tile=32)
    raw_k, over_k = ex.expert_raw_fn_tiled(field, pos, dirs, budget=384,
                                           tile=32, use_kernel=True)
    np.testing.assert_allclose(np.asarray(raw_k), np.asarray(raw_j),
                               atol=2e-5, rtol=2e-5)
    assert int(over_j.sum()) == int(over_k.sum()) == 0


def test_kernel_bf16_close_to_f32():
    field = _field(jax.random.PRNGKey(6))
    N = 128
    pos = jax.random.uniform(jax.random.PRNGKey(7), (N, 3),
                             minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(jax.random.PRNGKey(8), (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    f32, _ = ex.expert_raw_fn_tiled(field, pos, dirs, budget=256, tile=32,
                                    use_kernel=True)
    bf16, _ = ex.expert_raw_fn_tiled(field, pos, dirs, budget=256, tile=32,
                                     use_kernel=True,
                                     compute_dtype=jnp.bfloat16)
    assert np.max(np.abs(np.asarray(f32) - np.asarray(bf16))) < 0.15


def test_render_rays_kernel_matches():
    field = _field(jax.random.PRNGKey(9), grid=2, hidden=8)
    R, S = 16, 24
    o = jnp.zeros((R, 3)).at[:, 2].set(-2.0)
    d = jax.random.normal(jax.random.PRNGKey(10), (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    z = jnp.broadcast_to(jnp.linspace(0.5, 4.0, S), (R, S))
    out_j, ov_j = ex.render_rays_with_experts_tiled(field, o, d, z, 640, 32)
    out_k, ov_k = ex.render_rays_with_experts_tiled(field, o, d, z, 640, 32,
                                                    use_kernel=True)
    np.testing.assert_allclose(np.asarray(out_k.rgb), np.asarray(out_j.rgb),
                               atol=1e-4)
    assert int(ov_j) == int(ov_k) == 0
