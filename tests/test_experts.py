"""KiloNeRF-style expert distillation (render/experts.py): distilling a
randomly-initialized RenderRayNet teacher into a 2^3 grid of tiny experts must
reproduce its raw field on held-out samples and its rendered pixels, and the
distilled experts must evaluate identically through the SHARDED ep routing.
PositionalEncoder is used by the teacher construction only."""
import numpy as np

import jax
import jax.numpy as jnp

from smpl_nerf_tpu.core.encoding import PositionalEncoder
from smpl_nerf_tpu.core.integrate import raw2outputs
from smpl_nerf_tpu.models.render_ray_net import RenderRayNet
from smpl_nerf_tpu.parallel import ep
from smpl_nerf_tpu.parallel import mesh as mesh_mod
from smpl_nerf_tpu.render import experts as ex

AABB = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))


def _teacher(seed=0, l_pos=4, l_dir=2):
    """A small random RenderRayNet as the (smooth) field to distill."""
    pe_p = PositionalEncoder(l_pos, True)
    pe_d = PositionalEncoder(l_dir, True)
    net = RenderRayNet(n_layers=3, width=32, positions_dim=3 + 6 * l_pos,
                       directions_dim=3 + 6 * l_dir, skips=())
    x0 = jnp.zeros((2, (3 + 6 * l_pos) + (3 + 6 * l_dir)))
    params = net.init(jax.random.PRNGKey(seed), x0)

    def teacher_fn(pos, dirs):
        return net.apply(params, jnp.concatenate(
            [pe_p.encode(pos), pe_d.encode(dirs)], -1))

    return teacher_fn


_CACHE = {}


def _distilled(teacher_fn, tag="default"):
    if tag not in _CACHE:
        _CACHE[tag] = ex.distill_experts(
            teacher_fn, AABB[0], AABB[1], grid=2, key=jax.random.PRNGKey(1),
            hidden=64, n_steps=2500, batch=2048, lr=3e-3)
    return _CACHE[tag]


def test_distilled_field_matches_teacher_raw():
    teacher_fn = _teacher()
    field, loss = _distilled(teacher_fn)
    assert loss < 0.06, f"distillation did not converge (normalized): {loss}"
    rng = np.random.RandomState(7)
    pos = jnp.asarray(rng.uniform(-1, 1, (512, 3)).astype(np.float32))
    d = rng.randn(512, 3).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    got = np.asarray(ex.expert_raw_fn(field, pos, dirs))
    want = np.asarray(teacher_fn(pos, dirs))
    # held-out raw error well under the teacher's own output spread
    err = np.sqrt(np.mean((got - want) ** 2))
    spread = np.std(want)
    assert err < 0.25 * spread, (err, spread)


def test_distilled_render_matches_teacher_render():
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    rng = np.random.RandomState(3)
    R, S = 16, 24
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.05, 1.8, S), (R, S))

    got = ex.render_rays_with_experts(field, origins, dirs, z)
    pos = origins[:, None, :] + z[..., None] * dirs[:, None, :]
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw_t = teacher_fn(pos.reshape(-1, 3), d_flat).reshape(R, S, 4)
    want = raw2outputs(raw_t, z, dirs)
    mse = float(jnp.mean((got.rgb - want.rgb) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 30, f"distilled render PSNR {psnr:.1f} < 30 dB"


def test_distilled_experts_shard_over_mesh(devices):
    """The distilled stacked experts run unchanged through the EP-sharded
    routing (8 experts over 4 devices) and match the dense form."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    mesh = mesh_mod.make_mesh("2,4")
    rng = np.random.RandomState(5)
    pos = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    d = rng.randn(64, 3).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    ids = ep.voxel_expert_ids(pos, field.aabb_min, field.aabb_max, field.grid)
    x = ex._encode(field, pos, dirs)
    res = ep.expert_parallel_apply(mesh, field.experts, x, ids, capacity=64)
    assert not bool(res.overflow.any())
    np.testing.assert_allclose(np.asarray(res.out),
                               np.asarray(ep.expert_apply(field.experts, x, ids)),
                               atol=1e-5)


def test_bucketed_render_matches_dense_and_skips_outside():
    """The sorted-bucket serving path reproduces the dense render exactly,
    and rays leaving the AABB integrate identically (outside samples are
    zero-density by construction in BOTH paths: dense clamps to a border
    expert trained on near-boundary space, so compare only via z ranges
    inside; the bucketed path skips them exactly)."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    rng = np.random.RandomState(11)
    R, S = 16, 24
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.05, 1.7, S), (R, S))
    # all samples stay inside the AABB here -> exact dense equivalence
    pos = origins[:, None, :] + z[..., None] * dirs[:, None, :]
    assert bool(jnp.all((pos >= field.aabb_min) & (pos <= field.aabb_max)))
    want = ex.render_rays_with_experts(field, origins, dirs, z)
    got, n_over = ex.render_rays_with_experts_bucketed(
        field, origins, dirs, z, capacity=R * S)
    assert int(n_over) == 0
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb),
                               atol=1e-5)

    # rays extended PAST the AABB: the outside samples must contribute zero
    # density (same image as truncating the ray at the boundary)
    z_long = jnp.broadcast_to(jnp.linspace(0.05, 4.0, S), (R, S))
    got_long, n_over2 = ex.render_rays_with_experts_bucketed(
        field, origins, dirs, z_long, capacity=R * S)
    assert int(n_over2) == 0
    pos_l = origins[:, None, :] + z_long[..., None] * dirs[:, None, :]
    inside = np.asarray(jnp.all((pos_l >= field.aabb_min)
                                & (pos_l <= field.aabb_max), -1))
    raw_ref, _ = ex.expert_raw_fn_bucketed(
        field, pos_l.reshape(-1, 3),
        jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3),
        capacity=R * S)
    raw_ref = np.asarray(raw_ref).reshape(R, S, 4)
    assert np.all(raw_ref[~inside] == 0.0)


def test_finetune_reduces_pixel_error():
    """KiloNeRF stage 2: photometric fine-tuning on rays whose 'ground truth'
    comes from the teacher must reduce the distilled field's pixel MSE, with
    zero capacity overflow."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    rng = np.random.RandomState(21)
    R, S = 256, 16
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.4, 0.4, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.05, 1.7, S), (R, S))
    pos = origins[:, None, :] + z[..., None] * dirs[:, None, :]
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw_t = teacher_fn(pos.reshape(-1, 3), d_flat).reshape(R, S, 4)
    gt_rgb = raw2outputs(raw_t, z, dirs).rgb

    def pixel_mse(f):
        outs, n_over = ex.render_rays_with_experts_bucketed(
            f, origins, dirs, z, capacity=R * S)
        assert int(n_over) == 0
        return float(jnp.mean((outs.rgb - gt_rgb) ** 2))

    before = pixel_mse(field)
    tuned, loss, n_over = ex.finetune_experts(
        field, origins, dirs, gt_rgb, jax.random.PRNGKey(5),
        near=0.05, far=1.7, n_samples=S, capacity=R * S, n_steps=200,
        batch=256, lr=3e-4)
    assert n_over == 0
    after = pixel_mse(tuned)
    assert after < before, (before, after)
    # donation hygiene: the input field must remain usable after the call
    assert pixel_mse(field) == before


def test_compact_field_ess_render():
    """Empty-space skipping: with every cell occupied the compact render is
    EXACTLY the bucketed render; with a hand-built mask, samples in empty
    cells return zero raw; an all-empty mask raises."""
    import pytest
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    E = field.grid ** 3

    rng = np.random.RandomState(13)
    R, S = 16, 24
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.05, 1.7, S), (R, S))

    # all-occupied mask -> identical pixels to the bucketed path
    cfield = ex.compact_field(field, np.ones(E, bool))
    want, _ = ex.render_rays_with_experts_bucketed(field, origins, dirs, z,
                                                   capacity=R * S)
    got, n_over = ex.render_rays_with_experts_compact(cfield, origins, dirs,
                                                      z, capacity=R * S)
    assert int(n_over) == 0
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb),
                               atol=1e-6)

    # hand mask: only cell 0 occupied -> samples elsewhere give zero raw
    mask = np.zeros(E, bool)
    mask[0] = True
    cfield0 = ex.compact_field(field, mask)
    pos = (origins[:, None, :] + z[..., None] * dirs[:, None, :]).reshape(-1, 3)
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw, _ = ex.expert_raw_fn_compact(cfield0, pos, d_flat, capacity=R * S)
    ids = np.asarray(ep.voxel_expert_ids(pos, field.aabb_min, field.aabb_max,
                                         field.grid))
    assert np.all(np.asarray(raw)[ids != 0] == 0.0)
    assert np.abs(np.asarray(raw)[ids == 0]).max() > 0

    with pytest.raises(ValueError, match="no occupied"):
        ex.compact_field(field, np.zeros(E, bool))


def test_cell_occupancy_and_dilation():
    """The occupancy probe flags cells whose probes clear the threshold, and
    dilation grows the mask by exactly the 1-cell neighborhood (no wrap)."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    E = field.grid ** 3
    occ_all = ex.cell_occupancy(field, samples_per_axis=2,
                                sigma_thresh=-1e9)
    assert occ_all.shape == (E,) and occ_all.all()
    occ_none = ex.cell_occupancy(field, samples_per_axis=2, sigma_thresh=1e9)
    assert not occ_none.any()

    g = 4
    seed = np.zeros((g, g, g), bool)
    seed[0, 0, 0] = True
    grown = ex.dilate_occupancy(seed.reshape(-1), g).reshape(g, g, g)
    want = np.zeros((g, g, g), bool)
    for sh in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)]:
        want[sh] = True
    assert (grown == want).all(), "dilation must not wrap around"


def test_occupancy_biased_distillation_runs_and_converges():
    """distill_experts with an occupancy mask: biased sampling must still
    fit the teacher (same convergence bar as the uniform path at this tiny
    scale) — and a bias toward a single cell must not break the others'
    zero-anchoring (the uniform remainder covers them)."""
    teacher_fn = _teacher()
    occ = np.ones(8, bool)
    field, loss = ex.distill_experts(
        teacher_fn, AABB[0], AABB[1], grid=2, key=jax.random.PRNGKey(2),
        hidden=64, n_steps=1500, batch=2048, lr=3e-3,
        occupied=occ, bias_frac=0.5)
    assert loss < 0.1, loss
    rng = np.random.RandomState(9)
    pos = jnp.asarray(rng.uniform(-1, 1, (256, 3)).astype(np.float32))
    d = rng.randn(256, 3).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    err = np.sqrt(np.mean((np.asarray(ex.expert_raw_fn(field, pos, dirs))
                           - np.asarray(teacher_fn(pos, dirs))) ** 2))
    assert err < 0.35 * float(np.std(np.asarray(teacher_fn(pos, dirs))))


def test_tiled_render_matches_bucketed_full_and_compact():
    """Round-5 serving path: the sorted-tile render reproduces the bucketed
    render exactly, for the full field (skip = out-of-AABB) AND the compact
    field (skip also covers empty cells)."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    E = field.grid ** 3
    rng = np.random.RandomState(17)
    R, S = 16, 24
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.05, 4.0, S), (R, S))  # exits the AABB

    budget = ((R * S + E * 8) // 8) * 8
    want, _ = ex.render_rays_with_experts_bucketed(field, origins, dirs, z,
                                                   capacity=R * S)
    got, n_over = ex.render_rays_with_experts_tiled(field, origins, dirs, z,
                                                    budget, tile=8)
    assert int(n_over) == 0
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb),
                               atol=1e-5)

    # compact field with a real occupancy mask: tiled == bucketed-compact
    occ = ex.dilate_occupancy(ex.cell_occupancy(field, 2, 0.5), field.grid)
    if not occ.any():
        occ[0] = True
    cfield = ex.compact_field(field, occ)
    want_c, _ = ex.render_rays_with_experts_compact(cfield, origins, dirs, z,
                                                    capacity=R * S)
    got_c, n_over_c = ex.render_rays_with_experts_tiled(
        cfield, origins, dirs, z, budget, tile=8)
    assert int(n_over_c) == 0
    np.testing.assert_allclose(np.asarray(got_c.rgb), np.asarray(want_c.rgb),
                               atol=1e-5)


def test_tiled_finetune_matches_bucketed_and_accepts_compact():
    """finetune_experts through the tiled path is numerically IDENTICAL to
    the bucketed path (same keys -> same trajectory), runs with zero
    overflow, and a CompactExpertField fine-tunes directly
    (prune-then-finetune). Seed 21 = the known-converging setup of
    test_finetune_reduces_pixel_error."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    E = field.grid ** 3
    rng = np.random.RandomState(21)
    R, S = 256, 16
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.4, 0.4, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.05, 1.7, S), (R, S))
    pos = origins[:, None, :] + z[..., None] * dirs[:, None, :]
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw_t = teacher_fn(pos.reshape(-1, 3), d_flat).reshape(R, S, 4)
    gt_rgb = raw2outputs(raw_t, z, dirs).rgb
    budget = ((R * S + E * 8) // 8) * 8

    def pixel_mse(f):
        outs, n_over = ex.render_rays_with_experts_tiled(
            f, origins, dirs, z, budget, tile=8)
        assert int(n_over) == 0
        return float(jnp.mean((outs.rgb - gt_rgb) ** 2))

    before = pixel_mse(field)
    tuned, loss_t, n_over = ex.finetune_experts(
        field, origins, dirs, gt_rgb, jax.random.PRNGKey(5),
        near=0.05, far=1.7, n_samples=S, budget=budget, tile=8, n_steps=200,
        batch=256, lr=3e-4)
    assert n_over == 0
    assert pixel_mse(tuned) < before
    assert pixel_mse(field) == before      # donation hygiene

    # exact trajectory parity with the legacy bucketed path (same keys)
    tuned_b, loss_b, _ = ex.finetune_experts(
        field, origins, dirs, gt_rgb, jax.random.PRNGKey(5),
        near=0.05, far=1.7, n_samples=S, capacity=R * S, n_steps=200,
        batch=256, lr=3e-4)
    np.testing.assert_allclose(loss_t, loss_b, rtol=1e-6)
    np.testing.assert_allclose(pixel_mse(tuned), pixel_mse(tuned_b),
                               rtol=1e-6)

    # compact field fine-tunes through the same path, identical trajectory
    # when nothing is pruned
    cfield = ex.compact_field(field, np.ones(E, bool))
    tuned_c, loss_c, n_over_c = ex.finetune_experts(
        cfield, origins, dirs, gt_rgb, jax.random.PRNGKey(5),
        near=0.05, far=1.7, n_samples=S, budget=budget, tile=8, n_steps=200,
        batch=256, lr=3e-4)
    assert n_over_c == 0
    np.testing.assert_allclose(loss_c, loss_t, rtol=1e-6)

    import pytest
    with pytest.raises(ValueError, match="exactly one"):
        ex.finetune_experts(field, origins, dirs, gt_rgb,
                            jax.random.PRNGKey(5), near=0.05, far=1.7,
                            n_samples=S, n_steps=1, batch=8)


def test_culled_render_matches_tiled_full_and_compact():
    """Round-5 cull-then-route serving: identical outputs to the tiled path
    (which itself matches bucketed/dense) for the full field AND the compact
    field, with zero overflow at the host-sized budget."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    E = field.grid ** 3
    rng = np.random.RandomState(23)
    R, S = 16, 24
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.3, 0.3, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.05, 4.0, S), (R, S))  # exits the AABB

    budget = ((R * S + E * 8) // 8) * 8
    want, _ = ex.render_rays_with_experts_tiled(field, origins, dirs, z,
                                                budget, tile=8)
    got, n_over = ex.render_rays_with_experts_culled(field, origins, dirs, z,
                                                     budget, tile=8)
    assert int(n_over) == 0
    np.testing.assert_allclose(np.asarray(got.rgb), np.asarray(want.rgb),
                               atol=1e-5)

    occ = ex.dilate_occupancy(ex.cell_occupancy(field, 2, 0.5), field.grid)
    if not occ.any():
        occ[0] = True
    cfield = ex.compact_field(field, occ)
    want_c, _ = ex.render_rays_with_experts_tiled(cfield, origins, dirs, z,
                                                  budget, tile=8)
    got_c, n_over_c = ex.render_rays_with_experts_culled(
        cfield, origins, dirs, z, budget, tile=8)
    assert int(n_over_c) == 0
    np.testing.assert_allclose(np.asarray(got_c.rgb), np.asarray(want_c.rgb),
                               atol=1e-5)

    # kernel variant (interpret off-TPU) agrees too
    got_k, n_over_k = ex.render_rays_with_experts_culled(
        cfield, origins, dirs, z, budget, tile=8, use_kernel=True)
    assert int(n_over_k) == 0
    np.testing.assert_allclose(np.asarray(got_k.rgb),
                               np.asarray(want_c.rgb), atol=1e-4)


def test_culled_overflow_flagged_not_silent():
    """A too-small budget reports every culled-out sample (compaction drops
    + plan drops), never silently renders them away as empty space."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    rng = np.random.RandomState(29)
    R, S = 8, 16
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.2, 0.2, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.3, 1.4, S), (R, S))  # inside the AABB

    pos = (origins[:, None, :] + z[..., None] * dirs[:, None, :]).reshape(-1, 3)
    inside = np.asarray(jnp.all((pos >= field.aabb_min)
                                & (pos <= field.aabb_max), -1))
    n_in = int(inside.sum())
    assert n_in > 16
    _, n_over = ex.render_rays_with_experts_culled(field, origins, dirs, z,
                                                   budget=16, tile=8)
    assert int(n_over) >= n_in - 16


def test_finetune_checkpoint_resume(tmp_path, monkeypatch):
    """A fine-tune phase killed mid-way resumes from its checkpoint to the
    BITWISE-identical trajectory of an uninterrupted run: the checkpoint
    stores params + Adam state + overflow + PRNG key, so the resumed stream
    is the same stream. A stale checkpoint (different n_steps) is ignored;
    a completed phase deletes its checkpoint."""
    teacher_fn = _teacher()
    field, _ = _distilled(teacher_fn)
    E = field.grid ** 3
    rng = np.random.RandomState(21)
    R, S = 256, 16
    origins = jnp.asarray(np.tile([[0.0, 0.0, -0.9]], (R, 1)).astype(np.float32))
    d = rng.uniform(-0.4, 0.4, (R, 3)).astype(np.float32) + [0, 0, 1]
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    z = jnp.broadcast_to(jnp.linspace(0.05, 1.7, S), (R, S))
    pos = origins[:, None, :] + z[..., None] * dirs[:, None, :]
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw_t = teacher_fn(pos.reshape(-1, 3), d_flat).reshape(R, S, 4)
    gt_rgb = raw2outputs(raw_t, z, dirs).rgb
    budget = ((R * S + E * 8) // 8) * 8
    kw = dict(near=0.05, far=1.7, n_samples=S, budget=budget, tile=8,
              batch=256, lr=3e-4)
    ck = str(tmp_path / "ck.npz")

    # reference: uninterrupted 24-step phase
    ref, loss_ref, _ = ex.finetune_experts(
        field, origins, dirs, gt_rgb, jax.random.PRNGKey(5), n_steps=24, **kw)

    # "interrupted" phase: keep the step-16 checkpoint alive by disabling the
    # end-of-phase delete, as if the process died after step 16
    import os as _os
    monkeypatch.setattr(ex.os, "remove", lambda p: None)
    ex.finetune_experts(field, origins, dirs, gt_rgb, jax.random.PRNGKey(5),
                        n_steps=24, checkpoint_path=ck, checkpoint_every=16,
                        **kw)
    monkeypatch.undo()
    assert _os.path.exists(ck)
    assert int(np.load(ck)["step"]) == 16

    # resume: must land bitwise on the reference trajectory, then clean up
    res, loss_res, _ = ex.finetune_experts(
        field, origins, dirs, gt_rgb, jax.random.PRNGKey(5), n_steps=24,
        checkpoint_path=ck, checkpoint_every=16, **kw)
    assert loss_res == loss_ref
    for a, b in zip(jax.tree_util.tree_leaves(res.experts),
                    jax.tree_util.tree_leaves(ref.experts)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not _os.path.exists(ck)

    # stale checkpoint (n_steps mismatch) is ignored, run still completes
    np.savez(ck.replace(".npz", ".stale.npz"))
    _os.replace(ck.replace(".npz", ".stale.npz"), ck)
    out, _, _ = ex.finetune_experts(
        field, origins, dirs, gt_rgb, jax.random.PRNGKey(5), n_steps=8,
        checkpoint_path=ck, checkpoint_every=4, **kw)
    assert out is not None
