"""Expert parallelism: spatially-decomposed NeRF experts over the mesh.

The KiloNeRF observation applies directly to SMPL-NeRF scenes: a human
occupies a tiny AABB, and thousands of TINY per-voxel MLPs evaluate far
cheaper than one big trunk (the reference's single W=256 net is its only
option — SURVEY.md §2.3). This module provides the TPU-native expert layer:

  * Experts are STACKED tiny MLPs (params [E, ...]) assigned by voxel cell of
    the sample position (`voxel_expert_ids`). Stacked weights mean the whole
    mixture evaluates as batched matmuls on the MXU — no Python loop.
  * `expert_apply` is the dense form: every token gathers its expert's
    weights (small E, big tokens — gather-heavy, fine on CPU/small E).
  * `expert_parallel_apply` is the sharded form: tokens AND experts are
    sharded over one mesh axis, and tokens are routed to the device owning
    their expert with the classic MoE dance — capacity-bounded buckets,
    all_to_all there, batched expert matmuls, all_to_all back, scatter to the
    original slots. Communication is 2 all_to_alls of [E, C, D] floats, riding
    ICI. Overflow past the capacity is NOT silently dropped: tokens that
    didn't fit are returned in an `overflow` mask so the caller can fall back
    (rays re-bucketed, or the dense path) — the repo's no-silent-caps rule.

Differentiable end-to-end (scatter/gather/all_to_all have transposes), so the
same routing sits under jax.grad in training. Equivalence + grad parity vs the
dense form are tested on the virtual CPU mesh (tests/test_ep.py), and
__graft_entry__.dryrun_multichip exercises it as the EP leg next to DP/TP/SP/PP.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


class ExpertMLP(NamedTuple):
    """Stacked 2-layer ReLU expert MLPs: [E, D, H], [E, H], [E, H, O], [E, O]."""
    w0: jnp.ndarray
    b0: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray


def init_experts(key, n_experts: int, d_in: int, d_hidden: int, d_out: int,
                 dtype=jnp.float32) -> ExpertMLP:
    k0, k1 = jax.random.split(key)
    s0 = jnp.sqrt(2.0 / d_in).astype(dtype)
    s1 = jnp.sqrt(2.0 / d_hidden).astype(dtype)
    return ExpertMLP(
        w0=jax.random.normal(k0, (n_experts, d_in, d_hidden), dtype) * s0,
        b0=jnp.zeros((n_experts, d_hidden), dtype),
        w1=jax.random.normal(k1, (n_experts, d_hidden, d_out), dtype) * s1,
        b1=jnp.zeros((n_experts, d_out), dtype))


def voxel_expert_ids(points: jnp.ndarray, aabb_min, aabb_max,
                     grid: int) -> jnp.ndarray:
    """Assign each point [N, 3] to a cell of a grid^3 voxel partition of the
    AABB (points outside clamp to the border cell, like KiloNeRF)."""
    lo = jnp.asarray(aabb_min, points.dtype)
    hi = jnp.asarray(aabb_max, points.dtype)
    u = (points - lo) / (hi - lo)
    cell = jnp.clip((u * grid).astype(jnp.int32), 0, grid - 1)
    return (cell[..., 0] * grid + cell[..., 1]) * grid + cell[..., 2]


def _mlp(x, w0, b0, w1, b1):
    return jax.nn.relu(x @ w0 + b0) @ w1 + b1


def expert_apply(experts: ExpertMLP, x: jnp.ndarray,
                 expert_ids: jnp.ndarray) -> jnp.ndarray:
    """Dense reference: out[i] = MLP_{expert_ids[i]}(x[i]). Gathers per-token
    weights — the math contract expert_parallel_apply must reproduce."""
    w0 = experts.w0[expert_ids]
    w1 = experts.w1[expert_ids]
    h = jax.nn.relu(jnp.einsum("nd,ndh->nh", x, w0) + experts.b0[expert_ids])
    return jnp.einsum("nh,nho->no", h, w1) + experts.b1[expert_ids]


class EPResult(NamedTuple):
    out: jnp.ndarray       # [N, O]; zeros where overflowed
    overflow: jnp.ndarray  # [N] bool; True = token did not fit its bucket


def expert_apply_bucketed(experts: ExpertMLP, x: jnp.ndarray,
                          expert_ids: jnp.ndarray, capacity: int,
                          compute_dtype=None) -> EPResult:
    """Single-device MXU-dense expert evaluation via sort + static buckets.

    `expert_apply` gathers each token's WEIGHT tensors — N*(D*H + H*O) floats
    of HBM traffic, which dwarfs the tiny experts' FLOPs and is exactly the
    slow-gather regime this chip punishes. This form instead sorts tokens by
    expert, scatters them into [E, capacity, D] buckets, and evaluates the
    whole mixture as one batched matmul per layer — weights are read ONCE.
    It is the on-chip serving path for distilled fields
    (render/experts.py); `expert_parallel_apply` is the multi-device
    generalization of the same bucketing.

    Tokens with expert_ids == E (one past the last expert) are SKIPPED:
    output zeros, overflow False, and — unlike clamping — they consume no
    bucket capacity. Callers use this for samples outside the field's AABB,
    where the field is zero by construction.

    Tokens past `capacity` in their bucket come back masked in `overflow`
    (no silent drops); size capacity from a worst-case bucket count.

    `compute_dtype` (e.g. jnp.bfloat16) casts activations + weights for the
    bucket matmuls — halves the bucket tensors' HBM and doubles the MXU
    rate; the output is cast back to the input dtype for integration.
    """
    E = experts.w0.shape[0]
    N, D = x.shape
    C = int(capacity)
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        experts = ExpertMLP(*(w.astype(compute_dtype) for w in experts))
    order = jnp.argsort(expert_ids, stable=True)
    sorted_ids = expert_ids[order]
    # rank of each token within its expert's run of the sorted order
    starts = jnp.searchsorted(sorted_ids, jnp.arange(E))            # [E]
    pos = jnp.arange(N) - starts[jnp.clip(sorted_ids, 0, E - 1)]
    skip = sorted_ids >= E
    keep = (pos < C) & ~skip
    slot_e = jnp.where(keep, sorted_ids, E)        # E = dropped row
    slot_c = jnp.clip(pos, 0, C - 1)
    buckets = jnp.zeros((E + 1, C, D), x.dtype).at[slot_e, slot_c].set(
        x[order])[:E]
    out_b = jax.vmap(_mlp)(buckets, experts.w0, experts.b0,
                           experts.w1, experts.b1)                  # [E, C, O]
    out_sorted = (out_b[jnp.clip(slot_e, 0, E - 1), slot_c]
                  * keep[:, None].astype(out_b.dtype))
    O = out_b.shape[-1]
    out = jnp.zeros((N, O), out_b.dtype).at[order].set(out_sorted)
    overflow = jnp.zeros((N,), bool).at[order].set(~keep & ~skip)
    return EPResult(out.astype(out_dtype), overflow)


def expert_parallel_apply(mesh: Mesh, experts: ExpertMLP, x: jnp.ndarray,
                          expert_ids: jnp.ndarray, capacity: int,
                          axis: str = "model") -> EPResult:
    """MoE-routed expert evaluation with experts + tokens sharded over `axis`.

    x [N, D] and expert_ids [N] sharded on dim 0; experts sharded on their
    leading (expert) dim. `capacity` bounds tokens per (source shard, expert)
    bucket; E and N must divide by the axis size.
    """
    n = int(mesh.shape[axis])
    E = experts.w0.shape[0]
    N, D = x.shape
    O = experts.w1.shape[-1]
    if E % n or N % n:
        raise ValueError(f"E={E} and N={N} must divide the {n}-way axis")
    e_local = E // n
    C = int(capacity)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
             out_specs=(P(axis), P(axis)), check_vma=False)
    def run(w0, b0, w1, b1, x_l, ids_l):
        n_l = x_l.shape[0]
        # position of each token within its expert's bucket (stable order)
        onehot = jax.nn.one_hot(ids_l, E, dtype=jnp.int32)        # [n_l, E]
        pos = (jnp.cumsum(onehot, 0) * onehot).sum(-1) - 1         # [n_l]
        keep = pos < C
        # scatter into per-expert buckets [E, C, D]
        slot_e = jnp.where(keep, ids_l, E)      # overflow -> dropped row
        slot_c = jnp.clip(pos, 0, C - 1)
        buckets = jnp.zeros((E + 1, C, D), x_l.dtype).at[slot_e, slot_c].set(x_l)[:E]
        # route: [E, C, D] -> [n, e_local, C, D]; all_to_all swaps the expert
        # shard dim for the source shard dim
        send = buckets.reshape(n, e_local, C, D)
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=False)                     # [n, e_local, C, D]
        toks = recv.transpose(1, 0, 2, 3).reshape(e_local, n * C, D)
        out_tok = jax.vmap(_mlp)(toks, w0, b0, w1, b1)             # [e_local, n*C, O]
        back = out_tok.reshape(e_local, n, C, O).transpose(1, 0, 2, 3)
        got = jax.lax.all_to_all(back, axis, split_axis=0, concat_axis=0,
                                 tiled=False)                      # [n, e_local, C, O]
        got = got.reshape(E, C, O)
        out_l = got[slot_e.clip(0, E - 1), slot_c] * keep[:, None].astype(x_l.dtype)
        return out_l, ~keep

    out, overflow = run(experts.w0, experts.b0, experts.w1, experts.b1,
                        x, expert_ids)
    return EPResult(out, overflow)
