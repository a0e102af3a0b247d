"""Fused sorted-tile expert evaluation: encode + 2-layer expert MLP in ONE
Pallas kernel, expert weights selected per tile via scalar-prefetched block
index maps.

This is the TPU analog of KiloNeRF's fused per-block CUDA kernel (the
reference's precedent for hand-writing the serving hot loop is its native
torchsearchsorted/src/cuda/searchsorted_cuda_kernel.cu). The jnp tiled path
(parallel/ep.tiles_apply) already routes tokens into single-expert tiles and
gathers each tile's weights once, but it materializes the encoded stream
[L, D] (~20 MB per 4096-ray chunk at D=42) plus the gathered weight tensors
in HBM between ops. Here the grid walks the sorted stream one tile at a
time; each step's BlockSpec index map reads the tile's OWN expert row
straight from the stacked weights in HBM (no gathered copy), the positional
encoding `enc = [x, sin(x @ M + P)]` is built in VMEM (same in-kernel
encoding trick as ops/fused_mlp_v2.py), and only the [tile, 4] raw output is
written back.

The caller supplies CELL-LOCAL coordinates (render/experts._encode's
`u * grid - floor(...)` — a cheap elementwise op XLA fuses into the plan
gather); the kernel owns everything from encoding onward.

Interpret mode runs off-TPU automatically; oracle-tested against the jnp
tiled path in tests/test_expert_tiles_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smpl_nerf_tpu.ops.fused_mlp_v2 import encoding_matrices


def _enc_mats(l_pos: int, l_dir: int):
    Mp, Pp = encoding_matrices(3, l_pos)
    Md, Pd = encoding_matrices(3, l_dir)
    # phases as [1, 2L*3] so the kernel refs stay >= 2-D (Mosaic-friendly)
    return (jnp.asarray(Mp), jnp.asarray(Pp)[None],
            jnp.asarray(Md), jnp.asarray(Pd)[None])


def _tile_math(x_ref, w0, b0, w1, b1, Mp, Pp, Md, Pd, cdt):
    """[tile, 8] packed (local(3) | dirs(3) | valid(1) | pad) -> [tile, 4]."""
    local = x_ref[:, 0:3]
    dirs = x_ref[:, 3:6]
    mask = x_ref[:, 6:7]
    pos_e = jnp.sin(jnp.dot(local, Mp,
                            preferred_element_type=jnp.float32) + Pp)
    dir_e = jnp.sin(jnp.dot(dirs, Md,
                            preferred_element_type=jnp.float32) + Pd)
    # PositionalEncoder(include_identity=True) order: [x | sin f0 | cos f0 ..]
    enc = jnp.concatenate([local, pos_e, dirs, dir_e], -1).astype(cdt)
    h = jax.nn.relu(jnp.dot(enc, w0.astype(cdt),
                            preferred_element_type=jnp.float32)
                    + b0.astype(jnp.float32))
    o = (jnp.dot(h.astype(cdt), w1.astype(cdt),
                 preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32))
    return o * mask


@functools.partial(jax.jit, static_argnames=("tile", "compute_dtype",
                                             "l_pos", "l_dir", "interpret"))
def expert_tiles_forward(experts, local: jnp.ndarray, dirs: jnp.ndarray,
                         valid: jnp.ndarray, tile_expert: jnp.ndarray,
                         *, l_pos: int, l_dir: int, tile: int = 256,
                         compute_dtype=None, interpret=None) -> jnp.ndarray:
    """Fused tiles_apply: local/dirs [L, 3] f32 in plan order (local already
    cell-local), valid [L] bool, tile_expert [L // tile] int32 -> raw [L, 4]
    f32 (invalid slots zero). experts: ep.ExpertMLP ([E, D, H], [E, H],
    [E, H, O], [E, O]) with D == encoded_dim(l_pos, l_dir)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = local.shape[0]
    if L % tile:
        raise ValueError(f"L={L} must be a multiple of tile={tile}")
    T = L // tile
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.float32
    x = jnp.concatenate(
        [local.astype(jnp.float32), dirs.astype(jnp.float32),
         valid.astype(jnp.float32)[:, None],
         jnp.zeros((L, 1), jnp.float32)], -1)                 # [L, 8]
    mats = _enc_mats(l_pos, l_dir)
    w0, b0, w1, b1 = experts
    E, D, H = w0.shape
    O = w1.shape[-1]

    def kernel(te_ref, x_ref, w0_ref, b0_ref, w1_ref, b1_ref,
               Mp_ref, Pp_ref, Md_ref, Pd_ref, out_ref):
        del te_ref  # consumed by the index maps
        out_ref[:] = _tile_math(
            x_ref[:], w0_ref[0], b0_ref[0], w1_ref[0], b1_ref[0],
            Mp_ref[:], Pp_ref[:], Md_ref[:], Pd_ref[:], cdt)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, te: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((tile, 8), lambda i, te: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, H), lambda i, te: (te[i], 0, 0),
                             memory_space=pltpu.VMEM),
                # biases ride as [E, 1, H]/[E, 1, O]: Mosaic requires a block's
                # LAST TWO dims to be (8, 128)-aligned or equal to the array's
                # — a (1, H) block of an [E, H] array is neither (the round-5
                # on-TPU lowering failure); (1, 1, H) of [E, 1, H] is equal
                pl.BlockSpec((1, 1, H), lambda i, te: (te[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, O), lambda i, te: (te[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, O), lambda i, te: (te[i], 0, 0),
                             memory_space=pltpu.VMEM),
                full(mats[0].shape), full(mats[1].shape),
                full(mats[2].shape), full(mats[3].shape),
            ],
            out_specs=pl.BlockSpec((tile, O), lambda i, te: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((L, O), jnp.float32),
        interpret=bool(interpret),
    )(tile_expert.astype(jnp.int32), x, w0, b0[:, None, :], w1,
      b1[:, None, :], *mats)
    return out
