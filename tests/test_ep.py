"""Expert-parallel routing (parallel/ep.py) on the 8-virtual-device CPU mesh:
all_to_all-routed expert evaluation matches the dense gather form, gradients
flow through the routing, overflow is flagged (not silently dropped), and the
voxel assignment helper partitions the AABB correctly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.parallel import ep
from smpl_nerf_tpu.parallel import mesh as mesh_mod

E, D, H, O = 16, 6, 8, 4


def _setup(seed=0, n_tokens=64):
    key = jax.random.PRNGKey(seed)
    experts = ep.init_experts(key, E, D, H, O)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n_tokens, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, E, n_tokens).astype(np.int32))
    return experts, x, ids


def test_voxel_expert_ids_partitions_aabb():
    pts = jnp.asarray([[0.01, 0.01, 0.01],    # corner cell 0
                       [0.99, 0.99, 0.99],    # far corner
                       [-5.0, 0.5, 0.5],      # clamps to border
                       [0.5, 0.5, 0.5]], jnp.float32)
    ids = ep.voxel_expert_ids(pts, (0, 0, 0), (1, 1, 1), grid=4)
    assert int(ids[0]) == 0
    assert int(ids[1]) == 4 ** 3 - 1
    assert int(ids[2]) == ep.voxel_expert_ids(
        jnp.asarray([[0.0, 0.5, 0.5]]), (0, 0, 0), (1, 1, 1), 4)[0]
    assert int(ids[3]) == (2 * 4 + 2) * 4 + 2
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 64).all()


def test_expert_apply_matches_per_token_loop(rng):
    experts, x, ids = _setup()
    got = np.asarray(ep.expert_apply(experts, x, ids))
    for i in range(x.shape[0]):
        e = int(ids[i])
        h = np.maximum(np.asarray(x[i]) @ np.asarray(experts.w0[e])
                       + np.asarray(experts.b0[e]), 0)
        want = h @ np.asarray(experts.w1[e]) + np.asarray(experts.b1[e])
        np.testing.assert_allclose(got[i], want, atol=1e-5)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_expert_parallel_matches_dense(devices, n_shards):
    mesh = mesh_mod.make_mesh(f"{8 // n_shards},{n_shards}")
    experts, x, ids = _setup(n_tokens=64)
    want = ep.expert_apply(experts, x, ids)
    # capacity >= worst-case tokens per (source shard, expert): exact
    res = ep.expert_parallel_apply(mesh, experts, x, ids, capacity=64 // n_shards)
    assert not bool(res.overflow.any())
    np.testing.assert_allclose(np.asarray(res.out), np.asarray(want), atol=1e-5)


def test_overflow_is_flagged_not_silent(devices):
    mesh = mesh_mod.make_mesh("2,4")
    experts, x, _ = _setup(n_tokens=32)
    ids = jnp.zeros(32, jnp.int32)           # every token -> expert 0
    res = ep.expert_parallel_apply(mesh, experts, x, ids, capacity=2)
    ov = np.asarray(res.overflow)
    # 4 shards x 8 tokens each, 2 fit per shard -> 24 overflow, flagged
    assert ov.sum() == 32 - 4 * 2
    kept = ~ov
    want = np.asarray(ep.expert_apply(experts, x, ids))
    np.testing.assert_allclose(np.asarray(res.out)[kept], want[kept], atol=1e-5)
    assert (np.asarray(res.out)[ov] == 0).all()


def test_gradients_flow_through_routing(devices):
    mesh = mesh_mod.make_mesh("2,4")
    experts, x, ids = _setup(n_tokens=32)
    tgt = jnp.asarray(np.random.RandomState(1).rand(32, O).astype(np.float32))

    def loss_ep(ex):
        return jnp.mean((ep.expert_parallel_apply(mesh, ex, x, ids,
                                                  capacity=32).out - tgt) ** 2)

    def loss_dense(ex):
        return jnp.mean((ep.expert_apply(ex, x, ids) - tgt) ** 2)

    g_ep = jax.grad(loss_ep)(experts)
    g_dn = jax.grad(loss_dense)(experts)
    for a, b in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_dn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert any(float(jnp.abs(g).max()) > 0 for g in jax.tree.leaves(g_ep))


def test_shape_guards(devices):
    mesh = mesh_mod.make_mesh("2,4")
    experts, x, ids = _setup(n_tokens=32)
    bad = ep.ExpertMLP(experts.w0[:6], experts.b0[:6], experts.w1[:6],
                       experts.b1[:6])
    with pytest.raises(ValueError, match="divide"):
        ep.expert_parallel_apply(mesh, bad, x, ids, capacity=8)


def test_bucketed_matches_dense():
    experts, x, ids = _setup(n_tokens=128)
    want = np.asarray(ep.expert_apply(experts, x, ids))
    # generous capacity: exact match, nothing overflows
    res = ep.expert_apply_bucketed(experts, x, ids, capacity=128)
    np.testing.assert_allclose(np.asarray(res.out), want, atol=1e-5)
    assert not bool(res.overflow.any())
    # works under jit with static capacity
    jitted = jax.jit(ep.expert_apply_bucketed, static_argnums=3)
    res2 = jitted(experts, x, ids, 128)
    np.testing.assert_allclose(np.asarray(res2.out), want, atol=1e-5)


def test_bucketed_skip_id_consumes_no_capacity():
    experts, x, _ = _setup(n_tokens=64)
    # all tokens -> expert 3 except half marked skip (id == E)
    ids = jnp.asarray([3 if i % 2 == 0 else E for i in range(64)], jnp.int32)
    res = ep.expert_apply_bucketed(experts, x, ids, capacity=32)
    out = np.asarray(res.out)
    assert not bool(res.overflow.any())   # 32 real tokens fit capacity 32
    dense = np.asarray(ep.expert_apply(
        experts, x[::2], jnp.full((32,), 3, jnp.int32)))
    np.testing.assert_allclose(out[::2], dense, atol=1e-5)
    np.testing.assert_allclose(out[1::2], 0.0)   # skipped -> zeros


def test_bucketed_overflow_flagged_not_silent():
    experts, x, _ = _setup(n_tokens=64)
    ids = jnp.zeros((64,), jnp.int32)            # all to expert 0
    res = ep.expert_apply_bucketed(experts, x, ids, capacity=16)
    assert int(res.overflow.sum()) == 48
    # the kept tokens are exact, the overflowed ones zero
    kept = ~np.asarray(res.overflow)
    dense = np.asarray(ep.expert_apply(experts, x, ids))
    np.testing.assert_allclose(np.asarray(res.out)[kept], dense[kept],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.out)[~kept], 0.0)


def test_bucketed_compute_dtype_casts_and_restores():
    experts, x, ids = _setup(n_tokens=64)
    f32 = ep.expert_apply_bucketed(experts, x, ids, capacity=64)
    bf = ep.expert_apply_bucketed(experts, x, ids, capacity=64,
                                  compute_dtype=jnp.bfloat16)
    assert bf.out.dtype == x.dtype          # cast back for integration
    # bf16 mantissa: results agree to ~1% of the f32 magnitude
    scale = float(jnp.abs(f32.out).max())
    assert float(jnp.abs(f32.out - bf.out).max()) < 0.05 * max(scale, 1.0)
