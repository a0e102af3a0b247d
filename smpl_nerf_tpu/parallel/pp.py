"""Pipeline parallelism: depth-shard the RenderRayNet trunk over the mesh.

The reference is single-device (SURVEY.md §2.9) and at its production shape
(8 layers x W=256) pipelining is pointless — one chip's MXU swallows the whole
trunk (parallel/mesh.py documents that judgment). This module exists for the
regime where it stops being pointless: very deep / very wide render trunks
(W >= 1024, depth >= 16) whose weights or activations exceed one chip, the
same regime where tensor parallelism (parallel/tp.py) starts winning.

Design (GPipe-style, SPMD):

  * The trunk is rewritten as L UNIFORM layers over a carried (h, x) pair:
        h' = relu(concat(h, x * use_x[l]) @ K[l] + b[l]),  K[l]: [W+D, W]
    Layer 0 (h = 0, use_x = 1) reproduces `positions_pose_input`; skip layers
    (reference models/render_ray_net.py:24-28 concat) set use_x = 1; all other
    layers zero-mask the x rows. Uniform shapes make the per-layer params
    STACKABLE: kernels [L, W+D, W] shard over the mesh axis on dim 0, so each
    device owns a contiguous block of layers.
  * shard_map over the 'model' axis runs the classic pipeline schedule: at
    tick t the first stage injects microbatch t, every stage applies its layer
    block, and (h, x) ppermute to the next stage; the last stage collects
    microbatch t-(n_stages-1). n_micro + n_stages - 1 ticks total; bubble
    fraction (n_stages-1)/(n_micro+n_stages-1) — amortize with many
    microbatches, exactly the GPipe recipe.
  * Heads (additional_linear_layer, sigma/rgb, directional branch — a few
    thousand FLOPs/row) run densely after the pipeline, replicated.

Everything is differentiable (ppermute/scan/where have transposes), so the
same function sits under jax.grad in a training step — exercised by
__graft_entry__.dryrun_multichip and tests/test_pp.py on the virtual CPU mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def stack_trunk(params: dict, n_layers: int, skips: Sequence[int],
                pos_dim: int, width: int, n_stages: int = 1):
    """RenderRayNet trunk params -> stacked uniform pipeline layers.

    params: the RenderRayNet tree ({'params': {...}} or the inner dict) from
    models/render_ray_net.py. Returns (kernels [L, W+D, W], biases [L, W],
    use_x [L]) with L padded up to a multiple of n_stages using exact identity
    layers (K = [I; 0], b = 0: relu(h) == h since h is post-relu).
    """
    p = params.get("params", params)
    D, W = pos_dim, width
    kernels, biases, use_x = [], [], []

    def uniform(kernel, bias, with_x: bool, h_rows: bool):
        # built with jnp so gradients flow back to the original flax leaves
        kernel = jnp.asarray(kernel, jnp.float32)
        if h_rows and with_x:           # skip layer: kernel is already [W+D, W]
            k = kernel
        elif h_rows:                    # plain hidden layer: [W, W]
            k = jnp.concatenate([kernel, jnp.zeros((D, W), jnp.float32)], 0)
        else:                           # layer 0: [D, W] lives on the x rows
            k = jnp.concatenate([jnp.zeros((W, W), jnp.float32), kernel], 0)
        kernels.append(k)
        biases.append(jnp.asarray(bias, jnp.float32))
        use_x.append(1.0 if with_x else 0.0)

    lp = p["positions_pose_input"]
    uniform(lp["kernel"], lp["bias"], with_x=True, h_rows=False)
    for i in range(n_layers - 1):
        li = p[f"positional_net_{i}"]
        uniform(li["kernel"], li["bias"], with_x=i in tuple(skips), h_rows=True)

    while len(kernels) % n_stages:      # exact identity pad: relu(h @ I) == h
        kernels.append(jnp.concatenate(
            [jnp.eye(W, dtype=jnp.float32), jnp.zeros((D, W), jnp.float32)], 0))
        biases.append(jnp.zeros(W, jnp.float32))
        use_x.append(0.0)
    return (jnp.stack(kernels), jnp.stack(biases),
            jnp.asarray(np.asarray(use_x, np.float32)))


def trunk_dense(kernels, biases, use_x, x):
    """The unpipelined (single-device) forward of a stacked trunk — the math
    contract pipeline_trunk must reproduce exactly."""
    h = jnp.zeros(x.shape[:-1] + (kernels.shape[-1],), x.dtype)
    for l in range(kernels.shape[0]):
        inp = jnp.concatenate([h, x * use_x[l]], -1)
        h = jax.nn.relu(inp @ kernels[l] + biases[l])
    return h


def pipeline_trunk(mesh: Mesh, kernels, biases, use_x, x, n_micro: int,
                   axis: str = "model"):
    """Run the stacked trunk pipelined over mesh axis `axis`.

    x: [N, D] encoded inputs, N divisible by n_micro; kernels/biases/use_x
    from stack_trunk with L divisible by mesh.shape[axis]. Returns [N, W].
    """
    n_stages = int(mesh.shape[axis])
    L, WD, W = kernels.shape
    if L % n_stages:
        raise ValueError(f"{L} layers not divisible by {n_stages} stages "
                         "(stack_trunk(n_stages=...) pads)")
    lps = L // n_stages
    N = x.shape[0]
    if N % n_micro:
        raise ValueError(f"N={N} not divisible by n_micro={n_micro}")
    micro = N // n_micro
    x_micro = x.reshape(n_micro, micro, WD - W)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(None)),
             out_specs=P(None), check_vma=False)
    def run(k_l, b_l, ux_l, xm):
        idx = jax.lax.axis_index(axis)
        first, last = idx == 0, idx == n_stages - 1

        def stage(h, xs):
            for i in range(lps):
                inp = jnp.concatenate([h, xs * ux_l[i]], -1)
                h = jax.nn.relu(inp @ k_l[i] + b_l[i])
            return h

        def tick(carry, t):
            h, xs, out = carry
            mb_in = jnp.clip(t, 0, n_micro - 1)
            xs = jnp.where(first, xm[mb_in], xs)
            h = jnp.where(first, jnp.zeros_like(h), h)
            h = stage(h, xs)
            mb_out = t - (n_stages - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                out, h, jnp.clip(mb_out, 0, n_micro - 1), 0)
            out = jnp.where(last & (mb_out >= 0), upd, out)
            h = jax.lax.ppermute(h, axis, perm)
            xs = jax.lax.ppermute(xs, axis, perm)
            return (h, xs, out), None

        h0 = jnp.zeros((micro, W), xm.dtype)
        out0 = jnp.zeros((n_micro, micro, W), xm.dtype)
        (_, _, out), _ = jax.lax.scan(
            tick, (h0, xm[0], out0), jnp.arange(n_micro + n_stages - 1))
        # only the last stage holds real outputs; psum replicates them
        return jax.lax.psum(jnp.where(last, out, jnp.zeros_like(out)), axis)

    return run(kernels, biases, use_x, x_micro).reshape(N, W)


def pp_render_ray_net(mesh: Mesh, params: dict, x, *, n_layers: int = 8,
                      width: int = 256, pos_dim: int = 60, dir_dim: int = 24,
                      skips: Sequence[int] = (4,),
                      use_directional_input: bool = True,
                      n_micro: int = 4, axis: str = "model"):
    """Full RenderRayNet forward with the trunk pipelined over the mesh.

    Bit-for-bit the same math as RenderRayNet.apply (f32): trunk via
    pipeline_trunk, heads dense. x: [N, pos_dim(+additional) .. dir_dim]."""
    p = params.get("params", params)
    if pos_dim + dir_dim != x.shape[-1]:
        raise ValueError(
            f"pos_dim({pos_dim}) + dir_dim({dir_dim}) != x features "
            f"({x.shape[-1]}) — for a conditioned net fold the additional "
            "input width into pos_dim, or the slices silently overlap")
    # .shape is static even on tracers — never np.asarray params here (this
    # runs under jax.grad in tests; materializing a tracer raises)
    in_rows = p["positions_pose_input"]["kernel"].shape[0]
    if in_rows != pos_dim:
        raise ValueError(
            f"positions_pose_input kernel expects {in_rows} input rows but "
            f"pos_dim={pos_dim} — fold any additional_input_dim prefix into "
            "pos_dim")
    n_stages = int(mesh.shape[axis])
    kernels, biases, use_x = stack_trunk(p, n_layers, skips, pos_dim, width,
                                         n_stages=n_stages)
    positions = x[..., :pos_dim]
    directions = x[..., -dir_dim:]
    o = pipeline_trunk(mesh, kernels, biases, use_x, positions, n_micro, axis)
    o = o @ p["additional_linear_layer"]["kernel"] + p["additional_linear_layer"]["bias"]
    sigma = o @ p["sigma_out_layer"]["kernel"] + p["sigma_out_layer"]["bias"]
    if use_directional_input:
        o = jnp.concatenate([o, directions], -1)
    o = o @ p["directional_input"]["kernel"] + p["directional_input"]["bias"]
    o = jax.nn.relu(o @ p["directional_net_0"]["kernel"] + p["directional_net_0"]["bias"])
    rgb = o @ p["rgb_out_layer"]["kernel"] + p["rgb_out_layer"]["bias"]
    return jnp.concatenate([rgb, sigma], -1)
