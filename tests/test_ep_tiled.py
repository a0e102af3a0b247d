"""Round-5 sorted-tile grouped-matmul expert path (ep.sorted_tile_plan /
expert_apply_tiled) + the argsort rewrite of expert_parallel_apply: parity
with the dense gather form, skip-id semantics, overflow flagging, gradient
parity, and serving-scale E (VERDICT round-4 items 2 and 7)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.parallel import ep
from smpl_nerf_tpu.parallel import mesh as mesh_mod

E, D, H, O = 16, 6, 8, 4


def _setup(seed=0, n_tokens=128, n_experts=E):
    key = jax.random.PRNGKey(seed)
    experts = ep.init_experts(key, n_experts, D, H, O)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n_tokens, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, n_experts, n_tokens).astype(np.int32))
    return experts, x, ids


@pytest.mark.parametrize("tile", [8, 32])
def test_tiled_matches_dense(tile):
    experts, x, ids = _setup()
    want = np.asarray(ep.expert_apply(experts, x, ids))
    # generous budget: every run padded to tile, nothing overflows
    budget = (128 + E * tile // tile * tile)
    budget = ((128 + E * tile) // tile) * tile
    res = ep.expert_apply_tiled(experts, x, ids, budget, tile=tile)
    assert not bool(res.overflow.any())
    np.testing.assert_allclose(np.asarray(res.out), want, atol=1e-5)
    # and under jit with static budget/tile
    jitted = jax.jit(ep.expert_apply_tiled, static_argnums=(3, 4))
    res2 = jitted(experts, x, ids, budget, tile)
    np.testing.assert_allclose(np.asarray(res2.out), want, atol=1e-5)


def test_tiled_skip_id_consumes_no_slots():
    experts, x, _ = _setup(n_tokens=64)
    ids = jnp.asarray([3 if i % 2 == 0 else E for i in range(64)], jnp.int32)
    # budget exactly one tile of 32: fits the 32 real tokens only because
    # the 32 skip tokens consume nothing
    res = ep.expert_apply_tiled(experts, x, ids, budget=32, tile=32)
    assert not bool(res.overflow.any())
    dense = np.asarray(ep.expert_apply(
        experts, x[::2], jnp.full((32,), 3, jnp.int32)))
    np.testing.assert_allclose(np.asarray(res.out)[::2], dense, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.out)[1::2], 0.0)


def test_tiled_all_skip_is_all_zero():
    experts, x, _ = _setup(n_tokens=32)
    ids = jnp.full((32,), E, jnp.int32)
    res = ep.expert_apply_tiled(experts, x, ids, budget=32, tile=8)
    assert not bool(res.overflow.any())
    np.testing.assert_allclose(np.asarray(res.out), 0.0)


def test_tiled_overflow_flagged_not_silent():
    experts, x, _ = _setup(n_tokens=64)
    ids = jnp.zeros((64,), jnp.int32)          # all tokens -> expert 0
    res = ep.expert_apply_tiled(experts, x, ids, budget=16, tile=8)
    assert int(res.overflow.sum()) == 48
    kept = ~np.asarray(res.overflow)
    dense = np.asarray(ep.expert_apply(experts, x, ids))
    np.testing.assert_allclose(np.asarray(res.out)[kept], dense[kept],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.out)[~kept], 0.0)


def test_tiled_budget_must_be_tile_multiple():
    experts, x, ids = _setup(n_tokens=32)
    with pytest.raises(ValueError, match="multiple"):
        ep.expert_apply_tiled(experts, x, ids, budget=33, tile=8)


def test_tiled_compute_dtype_casts_and_restores():
    experts, x, ids = _setup(n_tokens=64)
    f32 = ep.expert_apply_tiled(experts, x, ids, budget=192, tile=8)
    bf = ep.expert_apply_tiled(experts, x, ids, budget=192, tile=8,
                               compute_dtype=jnp.bfloat16)
    assert bf.out.dtype == x.dtype
    scale = float(jnp.abs(f32.out).max())
    assert float(jnp.abs(f32.out - bf.out).max()) < 0.05 * max(scale, 1.0)


def test_tiled_gradients_match_dense():
    experts, x, ids = _setup(n_tokens=64)
    tgt = jnp.asarray(np.random.RandomState(1).rand(64, O).astype(np.float32))

    def loss_tiled(ex):
        return jnp.mean((ep.expert_apply_tiled(ex, x, ids, 192, 8).out
                         - tgt) ** 2)

    def loss_dense(ex):
        return jnp.mean((ep.expert_apply(ex, x, ids) - tgt) ** 2)

    g_t = jax.grad(loss_tiled)(experts)
    g_d = jax.grad(loss_dense)(experts)
    for a, b in zip(jax.tree.leaves(g_t), jax.tree.leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert any(float(jnp.abs(g).max()) > 0 for g in jax.tree.leaves(g_t))


def test_tiled_serving_scale_ids():
    """Serving-shaped routing: E = 4096 experts, most tokens skip — the
    regime the bucketed path's [E, capacity] tensor could not reach."""
    n_experts, n = 4096, 8192
    experts, _, _ = _setup(n_tokens=1, n_experts=n_experts)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(n, D).astype(np.float32))
    ids_np = rng.randint(0, n_experts, n).astype(np.int32)
    ids_np[rng.rand(n) < 0.9] = n_experts          # 90% skip
    ids = jnp.asarray(ids_np)
    real = ids_np < n_experts
    n_touched = len(np.unique(ids_np[real]))
    budget = ((int(real.sum()) + n_touched * 8) // 8 + 1) * 8
    res = ep.expert_apply_tiled(experts, x, ids, budget, tile=8)
    assert not bool(res.overflow.any())
    want = np.asarray(ep.expert_apply(
        experts, x[real], jnp.asarray(ids_np[real])))
    np.testing.assert_allclose(np.asarray(res.out)[real], want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.out)[~real], 0.0)


# ---- compact_stream: the round-5 cull-then-sort prepass ----

def test_compact_stream_roundtrip():
    rng = np.random.RandomState(7)
    keep_np = rng.rand(200) < 0.3
    keep = jnp.asarray(keep_np)
    k = int(keep_np.sum()) + 5
    comp = ep.compact_stream(keep, k)
    assert int(comp.n_dropped) == 0
    srcs = np.asarray(comp.src)[np.asarray(comp.valid)]
    np.testing.assert_array_equal(srcs, np.where(keep_np)[0])  # stable order
    # pos inverts src on kept tokens
    pos = np.asarray(comp.pos)
    for slot, i in enumerate(srcs):
        assert pos[i] == slot
    assert np.asarray(comp.kept).sum() == keep_np.sum()


def test_compact_stream_overflow_counted():
    keep = jnp.ones((64,), bool)
    comp = ep.compact_stream(keep, 48)
    assert int(comp.n_dropped) == 16
    assert int(np.asarray(comp.kept).sum()) == 48
    np.testing.assert_array_equal(np.asarray(comp.src), np.arange(48))


def test_compact_stream_empty_keep():
    comp = ep.compact_stream(jnp.zeros((32,), bool), 8)
    assert int(comp.n_dropped) == 0
    assert not bool(comp.valid.any())
    assert not bool(comp.kept.any())


# ---- expert_parallel_apply: argsort ranking + skip id (VERDICT item 7) ----

def test_parallel_skip_id_zeros_not_garbage(devices):
    mesh = mesh_mod.make_mesh("2,4")
    experts, x, _ = _setup(n_tokens=32)
    ids = jnp.asarray([3 if i % 2 == 0 else E for i in range(32)], jnp.int32)
    res = ep.expert_parallel_apply(mesh, experts, x, ids, capacity=8)
    assert not bool(res.overflow.any())          # skips are NOT overflow
    dense = np.asarray(ep.expert_apply(
        experts, x[::2], jnp.full((16,), 3, jnp.int32)))
    np.testing.assert_allclose(np.asarray(res.out)[::2], dense, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.out)[1::2], 0.0)


def test_parallel_large_E_no_onehot_blowup(devices):
    """E=4096 through the sharded path — the old one-hot rank computation
    materialized [N, E] and could not reach serving-scale E."""
    mesh = mesh_mod.make_mesh("2,4")
    n_experts, n = 4096, 512
    experts, _, _ = _setup(n_tokens=1, n_experts=n_experts)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(n, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, n_experts, n).astype(np.int32))
    res = ep.expert_parallel_apply(mesh, experts, x, ids, capacity=8)
    assert not bool(res.overflow.any())
    want = np.asarray(ep.expert_apply(experts, x, ids))
    np.testing.assert_allclose(np.asarray(res.out), want, atol=1e-4)
