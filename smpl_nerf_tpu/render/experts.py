"""KiloNeRF-style expert distillation: one big trunk -> a voxel grid of tiny
MLPs (this is a capability beyond the reference, which only ever has the
single W=256 net — /root/reference/models/render_ray_net.py).

Why: inference cost of a NeRF render is (rays x samples) trunk evaluations.
A distilled grid of tiny per-cell experts cuts the per-sample FLOPs by
10-100x at equal quality in the KiloNeRF regime, and the stacked-expert
layout (parallel/ep.py) keeps the evaluation MXU-dense (batched matmuls, one
gather per sample for the weights) and shards over a mesh with all_to_all
routing for pod-scale scenes.

Pieces:
  * `distill_experts` — fit stacked experts to ANY teacher field
    `teacher_fn(pos [N,3], dirs [N,3]) -> raw [N,4]` by sampling random
    (position, direction) pairs in the scene AABB (KiloNeRF's distillation
    step, arXiv:2103.13744, done here as one batched Adam loop over ALL
    experts at once instead of per-cell loops).
  * `expert_raw_fn` — the distilled drop-in for the trunk: positions are
    routed to their voxel's expert (dense gather form on one chip;
    parallel/ep.expert_parallel_apply is the sharded form of the same math).
  * `render_rays_with_experts` — volume-render rays straight from the
    distilled field (core.integrate.raw2outputs downstream, identical to the
    main pipeline's integration).

Tested by distilling a randomly-initialized RenderRayNet teacher and checking
held-out raw error + rendered-pixel agreement (tests/test_experts.py).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smpl_nerf_tpu.core.encoding import PositionalEncoder
from smpl_nerf_tpu.core.integrate import RenderOutputs, raw2outputs
from smpl_nerf_tpu.parallel import ep


class ExpertField(NamedTuple):
    """A distilled voxel-expert radiance field (all leaves jit-friendly)."""
    experts: ep.ExpertMLP
    aabb_min: jnp.ndarray   # [3]
    aabb_max: jnp.ndarray   # [3]
    grid: int               # experts = grid^3
    l_pos: int              # positional-encoding frequencies (positions)
    l_dir: int              # positional-encoding frequencies (directions)


def _encode(field: ExpertField, pos, dirs):
    pe_p = PositionalEncoder(field.l_pos, True)
    pe_d = PositionalEncoder(field.l_dir, True)
    return jnp.concatenate([pe_p.encode(_local_coords(field, pos)),
                            pe_d.encode(dirs)], -1)


def _local_coords(field, pos):
    # KiloNeRF-style CELL-LOCAL coordinates: each expert sees its own cell
    # mapped to [0,1)^3, so the PE frequencies resolve intra-cell detail
    # instead of being spent on locating the cell (which the routing does)
    u = (pos - field.aabb_min) / (field.aabb_max - field.aabb_min)
    return u * field.grid - jnp.floor(
        jnp.clip(u * field.grid, 0, field.grid - 1e-4))


def encoded_dim(l_pos: int, l_dir: int) -> int:
    return (3 + 6 * l_pos) + (3 + 6 * l_dir)


def expert_raw_fn(field: ExpertField, pos: jnp.ndarray,
                  dirs: jnp.ndarray) -> jnp.ndarray:
    """raw [N,4] from the distilled field — the trunk drop-in."""
    ids = ep.voxel_expert_ids(pos, field.aabb_min, field.aabb_max, field.grid)
    return ep.expert_apply(field.experts, _encode(field, pos, dirs), ids)


def _route(field, pos: jnp.ndarray):
    """Compact-aware routing: (ids, n_route) where ids in [0, n_route] and
    n_route is the skip id. Works for ExpertField (skip = out-of-AABB) and
    CompactExpertField (skip = out-of-AABB or empty cell via the remap)."""
    E = field.grid ** 3
    inside = jnp.all((pos >= field.aabb_min) & (pos <= field.aabb_max), -1)
    vox = ep.voxel_expert_ids(pos, field.aabb_min, field.aabb_max, field.grid)
    ids = jnp.where(inside, vox, E)
    remap = getattr(field, "remap", None)
    if remap is None:
        return ids, E
    return remap[ids], field.experts.w0.shape[0]


def expert_raw_fn_tiled(field, pos: jnp.ndarray, dirs: jnp.ndarray,
                        budget: int, tile: int = 256, compute_dtype=None,
                        use_kernel: bool = False):
    """raw [N,4] via the sorted-tile grouped matmul (ep.sorted_tile_plan) —
    the round-5 serving path. vs the bucketed form: no [E, capacity] dense
    tensor (slots = real in-field samples + ≤tile-1 padding per touched
    expert), weights gathered once per tile, and the POSITIONAL ENCODING runs
    only on the padded stream (empty-space samples never get encoded at all —
    on human scenes that alone cuts the encode work ~10×). Accepts an
    ExpertField or a CompactExpertField (empty-space skipping via the remap).
    Returns (raw [N,4], overflow [N])."""
    ids, n_route = _route(field, pos)
    plan = ep.sorted_tile_plan(ids, n_route, budget, tile)
    if use_kernel:
        # fused Pallas path: encode + both expert layers in one kernel, the
        # tile's weight row read straight from HBM via a scalar-prefetched
        # index map (ops/expert_tiles_pallas.py)
        from smpl_nerf_tpu.ops.expert_tiles_pallas import expert_tiles_forward
        out_slots = expert_tiles_forward(
            field.experts, _local_coords(field, pos[plan.tok]),
            dirs[plan.tok], plan.valid, plan.tile_expert,
            l_pos=field.l_pos, l_dir=field.l_dir, tile=tile,
            compute_dtype=compute_dtype)
    else:
        x = _encode(field, pos[plan.tok], dirs[plan.tok])
        out_slots = ep.tiles_apply(field.experts, x, plan,
                                   compute_dtype=compute_dtype)
    return ep.plan_take(plan, out_slots), plan.overflow


def render_rays_with_experts_tiled(field, origins: jnp.ndarray,
                                   dirs: jnp.ndarray, z_vals: jnp.ndarray,
                                   budget: int, tile: int = 256,
                                   white_background: bool = False,
                                   compute_dtype=None,
                                   use_kernel: bool = False) -> tuple:
    """Tiled-serving renderer (full or compact field). Returns
    (RenderOutputs, n_overflow) — callers must check n_overflow == 0 (no
    silent caps) and raise the budget otherwise."""
    pos = origins[:, None, :] + z_vals[..., None] * dirs[:, None, :]
    R, S = z_vals.shape
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw, overflow = expert_raw_fn_tiled(field, pos.reshape(-1, 3), d_flat,
                                        budget, tile,
                                        compute_dtype=compute_dtype,
                                        use_kernel=use_kernel)
    outs = raw2outputs(raw.reshape(R, S, 4), z_vals, dirs,
                       white_background=white_background)
    return outs, overflow.sum()


def expert_raw_fn_culled(field, pos: jnp.ndarray, dirs: jnp.ndarray,
                         budget: int, tile: int = 256, compute_dtype=None,
                         use_kernel: bool = False):
    """Cull-then-route serving: the round-5 fast path.

    `expert_raw_fn_tiled` builds its sorted-tile plan on the RAW sample
    stream — the argsort (XLA bitonic sort, O(N log^2 N) VPU passes) and the
    plan's inverse scatter both run over every sample, ~90% of which are
    skip-routed anyway on human scenes (outside the AABB / empty cells under
    a CompactExpertField remap). Measured on the round-5 distilled field this
    fixed per-chunk cost kept ESS serving SLOWER than the 8x256 teacher
    (1295 ms vs 728 ms at 256^2x192 — artifacts/round5/distill_static).

    Here the in-field samples are first compacted with `ep.compact_stream`
    (one cumsum + one scatter, O(N)) and the sort/plan/encode/MLP all run on
    the compact [budget] stream; results map back through one O(N) gather.
    Same `budget` sizing as the tiled path (host-side worst case via
    tools/distill_run.tiled_budget — it bounds real tokens + per-expert
    padding, so it bounds the compact stream too). Overflow is the sum of
    compaction drops and plan drops — never silent.

    Accepts ExpertField or CompactExpertField. Returns (raw [N,4], n_overflow
    scalar). The reference's serving loop being beaten is its full-trunk
    chunked forward (reference inference.py:247-254).
    """
    ids, n_route = _route(field, pos)
    comp = ep.compact_stream(ids < n_route, budget)
    ids_c = jnp.where(comp.valid, ids[comp.src], n_route)
    plan = ep.sorted_tile_plan(ids_c, n_route, budget, tile)
    src = comp.src[plan.tok]
    if use_kernel:
        from smpl_nerf_tpu.ops.expert_tiles_pallas import expert_tiles_forward
        out_slots = expert_tiles_forward(
            field.experts, _local_coords(field, pos[src]), dirs[src],
            plan.valid, plan.tile_expert, l_pos=field.l_pos,
            l_dir=field.l_dir, tile=tile, compute_dtype=compute_dtype)
    else:
        x = _encode(field, pos[src], dirs[src])
        out_slots = ep.tiles_apply(field.experts, x, plan,
                                   compute_dtype=compute_dtype)
    out_c = ep.plan_take(plan, out_slots)                    # [budget, O]
    raw = (out_c[jnp.clip(comp.pos, 0, budget - 1)]
           * comp.kept[:, None].astype(out_c.dtype))
    return raw, plan.overflow.sum() + comp.n_dropped


def render_rays_with_experts_culled(field, origins: jnp.ndarray,
                                    dirs: jnp.ndarray, z_vals: jnp.ndarray,
                                    budget: int, tile: int = 256,
                                    white_background: bool = False,
                                    compute_dtype=None,
                                    use_kernel: bool = False) -> tuple:
    """Cull-then-route twin of render_rays_with_experts_tiled (same contract:
    callers must check n_overflow == 0 and raise the budget otherwise)."""
    pos = origins[:, None, :] + z_vals[..., None] * dirs[:, None, :]
    R, S = z_vals.shape
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw, n_over = expert_raw_fn_culled(field, pos.reshape(-1, 3), d_flat,
                                       budget, tile,
                                       compute_dtype=compute_dtype,
                                       use_kernel=use_kernel)
    outs = raw2outputs(raw.reshape(R, S, 4), z_vals, dirs,
                       white_background=white_background)
    return outs, n_over


def expert_raw_fn_bucketed(field: ExpertField, pos: jnp.ndarray,
                           dirs: jnp.ndarray, capacity: int,
                           compute_dtype=None):
    """raw [N,4] via the sorted-bucket MXU path (ep.expert_apply_bucketed) —
    the on-chip serving form. Samples OUTSIDE the AABB are routed to the
    skip id (zero raw -> zero density, exact for a field distilled over an
    AABB that covers all mass) and consume no bucket capacity, so `capacity`
    only needs to cover in-AABB samples. Returns (raw [N,4], overflow [N])."""
    E = field.grid ** 3
    inside = jnp.all((pos >= field.aabb_min) & (pos <= field.aabb_max), -1)
    ids = jnp.where(
        inside,
        ep.voxel_expert_ids(pos, field.aabb_min, field.aabb_max, field.grid),
        E)
    res = ep.expert_apply_bucketed(field.experts, _encode(field, pos, dirs),
                                   ids, capacity, compute_dtype=compute_dtype)
    return res.out, res.overflow


def render_rays_with_experts_bucketed(
        field: ExpertField, origins: jnp.ndarray, dirs: jnp.ndarray,
        z_vals: jnp.ndarray, capacity: int,
        white_background: bool = False, compute_dtype=None) -> tuple:
    """Bucketed-serving twin of render_rays_with_experts.

    Returns (RenderOutputs, n_overflow) — callers must check n_overflow == 0
    (no silent caps) and re-run with a larger capacity otherwise."""
    pos = origins[:, None, :] + z_vals[..., None] * dirs[:, None, :]
    R, S = z_vals.shape
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw, overflow = expert_raw_fn_bucketed(field, pos.reshape(-1, 3), d_flat,
                                           capacity,
                                           compute_dtype=compute_dtype)
    outs = raw2outputs(raw.reshape(R, S, 4), z_vals, dirs,
                       white_background=white_background)
    return outs, overflow.sum()


def distill_experts(teacher_fn: Callable, aabb_min, aabb_max, grid: int,
                    key, *, hidden: int = 32, l_pos: int = 4, l_dir: int = 2,
                    n_steps: int = 1000, batch: int = 4096,
                    lr: float = 1e-3, occupied=None,
                    bias_frac: float = 0.5) -> tuple:
    """Fit a grid^3 stacked-expert field to the teacher by sampled regression.
    Returns (ExpertField, final mse loss).

    Every step draws `batch` uniform positions in the AABB + random unit
    directions, queries the teacher, and Adam-steps ALL experts jointly on
    the per-channel-normalized MSE of the raw [rgb, sigma] outputs (each
    sample only touches its own cell's expert via the gather in
    ep.expert_apply). Channel normalization matters: sigma's raw variance is
    often 3-4x smaller than the rgb channels', but render quality is MOST
    sensitive to sigma (it enters the transmittance product of every later
    sample along the ray) — an unweighted MSE underfits exactly the channel
    that matters most.

    `occupied` [grid^3] bool (e.g. grid_occupancy of the teacher) turns on
    occupancy-biased sampling: `bias_frac` of each batch is drawn uniformly
    WITHIN occupied cells, the rest uniformly over the AABB. On human scenes
    ~97% of cells are empty, so uniform sampling spends ~97% of the
    regression on "predict zero" — the bias concentrates capacity where the
    density lives while the uniform remainder keeps empty space pinned.
    """
    import numpy as np
    aabb_min = jnp.asarray(aabb_min, jnp.float32)
    aabb_max = jnp.asarray(aabb_max, jnp.float32)
    k_init, k_data = jax.random.split(key)
    experts = ep.init_experts(k_init, grid ** 3, encoded_dim(l_pos, l_dir),
                              hidden, 4)
    field = ExpertField(experts, aabb_min, aabb_max, grid, l_pos, l_dir)
    tx = optax.adam(lr)
    opt_state = tx.init(experts)
    cell_size = (aabb_max - aabb_min) / grid
    occ_ids = (jnp.asarray(np.where(np.asarray(occupied, bool))[0], jnp.int32)
               if occupied is not None else None)

    def sample(k):
        kp, kd, kc, ko, kb = jax.random.split(k, 5)
        pos = aabb_min + (aabb_max - aabb_min) * jax.random.uniform(
            kp, (batch, 3))
        if occ_ids is not None:
            cid = occ_ids[jax.random.randint(kc, (batch,), 0, occ_ids.shape[0])]
            corner = jnp.stack([cid // (grid * grid),
                                (cid // grid) % grid,
                                cid % grid], -1).astype(jnp.float32)
            pos_b = (aabb_min + (corner + jax.random.uniform(ko, (batch, 3)))
                     * cell_size)
            take = jax.random.uniform(kb, (batch, 1)) < bias_frac
            pos = jnp.where(take, pos_b, pos)
        d = jax.random.normal(kd, (batch, 3))
        dirs = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
        return pos, dirs

    # per-channel scales from one probe batch (fixed through training so the
    # objective is stationary)
    probe = jax.lax.stop_gradient(teacher_fn(*sample(k_data)))
    ch_scale = jnp.maximum(jnp.std(probe, axis=0), 1e-3)

    @jax.jit
    def step(experts, opt_state, k):
        pos, dirs = sample(k)
        target = jax.lax.stop_gradient(teacher_fn(pos, dirs))
        ids = ep.voxel_expert_ids(pos, aabb_min, aabb_max, grid)
        x = _encode(field, pos, dirs)

        def loss_fn(ex):
            d2 = (ep.expert_apply(ex, x, ids) - target) / ch_scale
            return jnp.mean(d2 ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(experts)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(experts, updates), opt_state, loss

    loss = jnp.inf
    hb = max(1, n_steps // 20)  # heartbeat: long fits must not look hung
    for i in range(n_steps):
        k_data, sub = jax.random.split(k_data)
        experts, opt_state, loss = step(experts, opt_state, sub)
        if (i + 1) % hb == 0 or i + 1 == n_steps:
            print(f"  distill step {i + 1}/{n_steps} nmse {float(loss):.4f}",
                  flush=True)
    return field._replace(experts=experts), float(loss)


class CompactExpertField(NamedTuple):
    """An ExpertField restricted to its OCCUPIED cells (KiloNeRF's empty-space
    skipping, done at the expert level): only occupied cells keep an expert,
    and the [E_occ, capacity] bucket tensors shrink with them. E_occ is baked
    on the host, so every shape stays static under jit."""
    experts: ep.ExpertMLP           # [E_occ, ...]
    remap: jnp.ndarray              # [E + 1] int32: voxel id (or the E
    #                                 out-of-AABB sentinel) -> compact id;
    #                                 empty cells and the sentinel map to
    #                                 E_occ (the skip id)
    aabb_min: jnp.ndarray
    aabb_max: jnp.ndarray
    grid: int
    l_pos: int
    l_dir: int


def grid_occupancy(raw_fn: Callable, aabb_min, aabb_max, grid: int,
                   samples_per_axis: int = 3, sigma_thresh: float = 1.0,
                   chunk: int = 262144):
    """[grid^3] bool (host numpy): does any lattice probe inside each cell
    clear `sigma_thresh` raw density, for ANY field
    `raw_fn(pos [N,3], dirs [N,3]) -> raw [N,4]` (the teacher trunk or the
    distilled experts). Cell order is lexicographic (x*g + y)*g + z — the
    same id layout as ep.voxel_expert_ids.

    Probes with THREE spread directions and keeps the max sigma per point:
    the teacher trunk's sigma is direction-independent by construction, but a
    distilled expert concatenates the direction encoding into the same tiny
    net, so its sigma can drift with view — a single-direction probe could
    drop a cell whose density only clears the threshold from other
    directions (hole in the compacted render)."""
    import numpy as np
    g, k = grid, samples_per_axis
    lo = np.asarray(aabb_min, np.float32)
    hi = np.asarray(aabb_max, np.float32)
    cell = (hi - lo) / g
    ax = np.arange(g, dtype=np.float32)
    corners = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    # k^3 probe offsets strictly inside the cell
    off = (np.arange(k, dtype=np.float32) + 0.5) / k
    lattice = np.stack(np.meshgrid(off, off, off, indexing="ij"), -1).reshape(-1, 3)
    pts = ((corners[:, None, :] + lattice[None, :, :]) * cell + lo).reshape(-1, 3)
    probe_dirs = np.float32([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0],
                             [0.0, -0.7071068, -0.7071068]])
    # Probe in FIXED 65536-point chunks (padding the tail) rather than one
    # odd-sized batch: the XLA TPU fusion pass has been observed to SIGILL
    # its compile helper on the same teacher graph at 216000 rows that it
    # compiles fine at 65536 (the AABB probe's chunk size, so the program is
    # usually already in the compilation cache). One padded shape = one
    # compile, and tiny probes (< one chunk) stay unpadded.
    n = len(pts)
    chunk = min(chunk, 65536)
    if n > chunk and n % chunk:
        pts = np.concatenate([pts, pts[: chunk - n % chunk]])
    sig = []
    probe = jax.jit(lambda p, d: raw_fn(p, d)[:, 3])
    for i in range(0, len(pts), chunk):
        p = jnp.asarray(pts[i:i + chunk])
        s = None
        for pd in probe_dirs:
            d = jnp.broadcast_to(jnp.asarray(pd), p.shape)
            si = np.asarray(probe(p, d))
            s = si if s is None else np.maximum(s, si)
        sig.append(s)
    sigma = np.concatenate(sig)[:n].reshape(g ** 3, k ** 3)
    return sigma.max(axis=1) > sigma_thresh


def cell_occupancy(field: ExpertField, samples_per_axis: int = 3,
                   sigma_thresh: float = 1.0):
    """[E] bool (host numpy): grid_occupancy of the DISTILLED field itself,
    so the mask is exactly consistent with what serving would render."""
    return grid_occupancy(partial(expert_raw_fn, field), field.aabb_min,
                          field.aabb_max, field.grid, samples_per_axis,
                          sigma_thresh)


def dilate_occupancy(occupied, grid: int):
    """One-cell 6/26-neighborhood dilation (numpy, host) — guards thin
    structures the probe lattice might straddle, same safety net as
    ops/occupancy's voxel dilation."""
    import numpy as np
    occ = np.asarray(occupied, bool).reshape(grid, grid, grid)
    out = occ.copy()
    for axis in range(3):
        fwd = [slice(None)] * 3
        bwd = [slice(None)] * 3
        fwd[axis] = slice(1, None)
        bwd[axis] = slice(None, -1)
        out[tuple(fwd)] |= occ[tuple(bwd)]   # +1 shift, no wrap
        out[tuple(bwd)] |= occ[tuple(fwd)]   # -1 shift, no wrap
    return out.reshape(-1)


def compact_field(field: ExpertField, occupied) -> CompactExpertField:
    """Drop empty cells' experts; build the id remap on the host so E_occ is
    a static shape. Empty cells and the out-of-AABB sentinel both remap to
    the compact skip id E_occ."""
    import numpy as np
    occupied = np.asarray(occupied, bool)
    E = field.grid ** 3
    idx = np.where(occupied)[0]
    if idx.size == 0:
        raise ValueError("no occupied cells — sigma_thresh too high?")
    remap = np.full(E + 1, idx.size, np.int32)
    remap[idx] = np.arange(idx.size, dtype=np.int32)
    experts_c = ep.ExpertMLP(*(jnp.asarray(np.asarray(w)[idx])
                               for w in field.experts))
    return CompactExpertField(experts_c, jnp.asarray(remap),
                              field.aabb_min, field.aabb_max, field.grid,
                              field.l_pos, field.l_dir)


def expert_raw_fn_compact(cfield: CompactExpertField, pos: jnp.ndarray,
                          dirs: jnp.ndarray, capacity: int,
                          compute_dtype=None):
    """Serving with empty-space skipping: samples in empty cells (or outside
    the AABB) render as zero density and consume no bucket capacity; only
    the E_occ occupied experts' weights participate in the batched matmuls.
    Returns (raw [N,4], overflow [N])."""
    E = cfield.grid ** 3
    inside = jnp.all((pos >= cfield.aabb_min) & (pos <= cfield.aabb_max), -1)
    vox = ep.voxel_expert_ids(pos, cfield.aabb_min, cfield.aabb_max,
                              cfield.grid)
    ids = cfield.remap[jnp.where(inside, vox, E)]
    x = _encode(ExpertField(cfield.experts, cfield.aabb_min, cfield.aabb_max,
                            cfield.grid, cfield.l_pos, cfield.l_dir),
                pos, dirs)
    res = ep.expert_apply_bucketed(cfield.experts, x, ids, capacity,
                                   compute_dtype=compute_dtype)
    return res.out, res.overflow


def render_rays_with_experts_compact(
        cfield: CompactExpertField, origins: jnp.ndarray, dirs: jnp.ndarray,
        z_vals: jnp.ndarray, capacity: int,
        white_background: bool = False, compute_dtype=None) -> tuple:
    """ESS twin of render_rays_with_experts_bucketed."""
    pos = origins[:, None, :] + z_vals[..., None] * dirs[:, None, :]
    R, S = z_vals.shape
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw, overflow = expert_raw_fn_compact(cfield, pos.reshape(-1, 3), d_flat,
                                          capacity,
                                          compute_dtype=compute_dtype)
    outs = raw2outputs(raw.reshape(R, S, 4), z_vals, dirs,
                       white_background=white_background)
    return outs, overflow.sum()


def finetune_experts(field, origins, dirs, rgb, key, *,
                     near: float, far: float, n_samples: int,
                     capacity: int = 0, budget: int = 0, tile: int = 32,
                     n_steps: int = 1000, batch: int = 4096, lr: float = 5e-4,
                     white_background: bool = False,
                     checkpoint_path: str | None = None,
                     checkpoint_every: int = 0):
    """KiloNeRF's second stage: photometric fine-tuning of the distilled
    experts on real training rays (arXiv:2103.13744 §3.3 — distillation gives
    the initialization, fine-tuning recovers the teacher-level quality the
    sampled-regression objective leaves behind).

    origins/dirs/rgb are the full train-split ray arrays [N,3]; every step
    draws `batch` rays, stratified-samples `n_samples` uniform z bins, renders
    through a serving path (differentiable: sort order is fixed given the
    ids, gradients flow through the activation scatter/gather), and
    Adam-steps the experts on the pixel MSE. Overflowed samples render as
    empty space — their count is accumulated and returned (no silent caps;
    size the cap so it stays 0).

    Pass `budget` (> 0, a multiple of `tile`) to train through the
    round-5 sorted-tile path — the fast form, and the one that accepts a
    CompactExpertField so pruned fields fine-tune directly (KiloNeRF's
    prune-then-finetune order). `capacity` (> 0) selects the legacy
    bucketed path (ExpertField only). Exactly one must be set.

    `checkpoint_path` + `checkpoint_every` make a LONG phase survive a
    mid-phase kill (the TPU tunnel flaps on ~20-40 min windows, a 20k-step
    phase is ~32 min): every `checkpoint_every` steps the full training
    state — params, Adam moments (incl. the schedule count), overflow
    counter, PRNG key — is written atomically to `checkpoint_path`; a rerun
    with the same arguments resumes the exact step/optimizer/RNG stream.

    Returns (field, final_loss, total_overflow).
    """
    if bool(budget) == bool(capacity):
        raise ValueError("set exactly one of budget (tiled) / capacity "
                         "(bucketed)")
    origins = jnp.asarray(origins)
    dirs = jnp.asarray(dirs)
    rgb = jnp.asarray(rgb)
    n_rays = origins.shape[0]
    tx = optax.adam(lr)
    opt_state = tx.init(field.experts)
    bins = jnp.linspace(near, far, n_samples + 1)
    lo, step_z = bins[:-1], (far - near) / n_samples

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(experts, opt_state, total_over, k):
        ki, kz = jax.random.split(k)
        idx = jax.random.randint(ki, (batch,), 0, n_rays)
        o, d, c = origins[idx], dirs[idx], rgb[idx]
        z = lo[None] + step_z * jax.random.uniform(kz, (batch, n_samples))

        def loss_fn(ex):
            if budget:
                outs, n_over = render_rays_with_experts_tiled(
                    field._replace(experts=ex), o, d, z, budget, tile,
                    white_background=white_background)
            else:
                outs, n_over = render_rays_with_experts_bucketed(
                    field._replace(experts=ex), o, d, z, capacity,
                    white_background=white_background)
            return jnp.mean((outs.rgb - c) ** 2), n_over

        (loss, n_over), grads = jax.value_and_grad(loss_fn, has_aux=True)(experts)
        updates, opt_state = tx.update(grads, opt_state)
        return (optax.apply_updates(experts, updates), opt_state,
                total_over + n_over, loss)

    # overflow accumulates ON DEVICE — a per-step int() round-trip would
    # serialize every dispatch through the tunnel. Copy the experts first:
    # donation would otherwise delete the CALLER's field.experts buffers on
    # the first step.
    experts, loss = jax.tree.map(jnp.array, field.experts), jnp.inf
    total_over = jnp.zeros((), jnp.int32)

    # Mid-phase resume: the checkpoint stores the flattened (experts,
    # opt_state, total_over) leaves; the treedef comes from the freshly
    # initialized state above, so a stale/mismatched file (different grid,
    # hidden, or optimizer) is detected by leaf count/shape and ignored.
    start = 0
    leaves0, treedef = jax.tree_util.tree_flatten(
        (experts, opt_state, total_over))
    if checkpoint_path and os.path.exists(checkpoint_path):
        z = np.load(checkpoint_path)
        names = [f"leaf{j}" for j in range(len(leaves0))]
        ok = ("n_steps" in z and int(z["n_steps"]) == n_steps
              and all(n in z for n in names)
              and all(z[n].shape == l.shape for n, l in zip(names, leaves0)))
        if ok:
            experts, opt_state, total_over = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(z[n]) for n in names])
            key = jnp.asarray(z["key"])
            start = int(z["step"])
            print(f"  resumed fine-tune checkpoint at step {start}/{n_steps}",
                  flush=True)
        else:
            print(f"  stale fine-tune checkpoint {checkpoint_path} ignored",
                  flush=True)

    def _save_checkpoint(step, experts, opt_state, total_over, key):
        leaves = jax.tree_util.tree_leaves((experts, opt_state, total_over))
        tmp = checkpoint_path + ".tmp.npz"  # savez keeps names ending .npz
        np.savez(tmp, step=step, n_steps=n_steps, key=np.asarray(key),
                 **{f"leaf{j}": np.asarray(l) for j, l in enumerate(leaves)})
        os.replace(tmp, checkpoint_path)  # atomic: no truncated checkpoints

    hb = max(1, n_steps // 20)  # heartbeat: long fits must not look hung
    for i in range(start, n_steps):
        key, sub = jax.random.split(key)
        experts, opt_state, total_over, loss = train_step(
            experts, opt_state, total_over, sub)
        if (i + 1) % hb == 0 or i + 1 == n_steps:
            print(f"  finetune step {i + 1}/{n_steps} mse {float(loss):.6f}",
                  flush=True)
        if (checkpoint_path and checkpoint_every
                and (i + 1) % checkpoint_every == 0 and (i + 1) < n_steps):
            _save_checkpoint(i + 1, experts, opt_state, total_over, key)
    if checkpoint_path and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)  # phase done — the caller saves the field
    return field._replace(experts=experts), float(loss), int(total_over)


def render_rays_with_experts(field: ExpertField, origins: jnp.ndarray,
                             dirs: jnp.ndarray, z_vals: jnp.ndarray,
                             white_background: bool = False) -> RenderOutputs:
    """Volume-render rays straight from the distilled field.

    origins/dirs [R,3], z_vals [R,S]; integration is the exact main-path
    raw2outputs, so distilled-vs-teacher image deltas isolate the field."""
    pos = origins[:, None, :] + z_vals[..., None] * dirs[:, None, :]
    R, S = z_vals.shape
    d_flat = jnp.broadcast_to(dirs[:, None, :], (R, S, 3)).reshape(-1, 3)
    raw = expert_raw_fn(field, pos.reshape(-1, 3), d_flat).reshape(R, S, 4)
    return raw2outputs(raw, z_vals, dirs, white_background=white_background)
