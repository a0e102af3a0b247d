"""Fused RenderRayNet v2: positional/directional ENCODING inside the kernel,
plus a fused Pallas BACKWARD that accumulates dW in VMEM across the grid.

v1 (ops/fused_mlp.py) reads the pre-encoded input row (~336 B/sample at
L=10/4); v2 reads [prefix || xyz(3) || dir(3)] (~24 B/sample unconditioned) and
builds both encodings in-kernel as ONE small matmul + sine:

    enc(x) = sin(x @ M + P),  M[d, 2L*d] with f_k on the (j mod d) row,
    P = 0 for sin blocks, pi/2 for cos blocks  (cos(t) == sin(t + pi/2))

matching core/encoding.py's reference block order exactly. That cuts the HBM
read per sample ~14x — on bandwidth-roofed silicon the forward becomes
MXU-bound end to end (CLAUDE.md round-2 roadmap item).

The backward pass is the second kernel: per input tile it RECOMPUTES the
forward (activations never exist in HBM), runs the tile VJP, writes the dX
tile, and ACCUMULATES every dW/db into VMEM-resident output blocks that all
grid steps revisit (init at step 0) — the planned "fused dW accumulation"
replacing v1's jnp recompute backward. The tile VJP is obtained by tracing
jax.vjp over the in-kernel forward: same math, no hand-derived chain rule to
drift out of sync.

Both kernels run interpret=True off-TPU, with jnp-reference oracle tests
(tests/test_fused_mlp_v2.py). Opt-in via --use_fused_mlp=2; on the current
bench chip W=256 matmuls are rate-capped (~20 TF/s) so v1/v2 show no win
THERE — kept opt-in for unthrottled silicon.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smpl_nerf_tpu.ops.fused_mlp import MlpSpec, _param_order, flatten_params

_TILE_FWD = 1024
_TILE_BWD = 256


def encoding_matrices(d: int, n_freqs: int) -> Tuple[np.ndarray, np.ndarray]:
    """(M [d, 2L*d], P [2L*d]) with enc(x) = sin(x @ M + P) in reference order
    [sin f0 | cos f0 | sin f1 | cos f1 | ...], each block spanning d dims."""
    M = np.zeros((d, 2 * n_freqs * d), np.float32)
    P = np.zeros((2 * n_freqs * d,), np.float32)
    for k in range(n_freqs):
        f = 2.0 ** k
        for trig in range(2):  # 0 = sin, 1 = cos
            base = (2 * k + trig) * d
            for j in range(d):
                M[j, base + j] = f
            if trig == 1:
                P[base:base + d] = np.pi / 2
    return M, P


def _spec_freqs(spec: MlpSpec) -> Tuple[int, int]:
    """Frequency counts implied by the encoded dims (3 coords, no identity)."""
    if spec.positions_dim % 6 or spec.directions_dim % 6:
        raise ValueError("v2 supports 3-coord sin/cos encodings without identity")
    return spec.positions_dim // 6, spec.directions_dim // 6


def raw_in_dim(spec: MlpSpec) -> int:
    return spec.additional_input_dim + 6


def _tile_forward(spec: MlpSpec, enc_mats, flat, x_raw: jnp.ndarray) -> jnp.ndarray:
    """Forward on a [T, add+6] raw tile — shared by kernel and jnp oracle."""
    cdt = jnp.dtype(spec.dtype)
    Mp, Pp, Md, Pd = enc_mats
    add = spec.additional_input_dim
    p3 = x_raw[:, add:add + 3]
    d3 = x_raw[:, add + 3:add + 6]
    pos_e = jnp.sin(jnp.dot(p3, Mp, preferred_element_type=jnp.float32) + Pp)
    dir_e = jnp.sin(jnp.dot(d3, Md, preferred_element_type=jnp.float32) + Pd)
    if add:
        # build the zero-width slice ONLY when it is non-empty: Mosaic cannot
        # lower [T, 0] vectors ("must have positive constant sizes") even
        # though interpret mode accepts them
        prefix = x_raw[:, :add].astype(cdt)
        pos = jnp.concatenate([prefix, pos_e.astype(cdt)], -1)
    else:
        pos = pos_e.astype(cdt)
    dirs = dir_e.astype(cdt)

    it = iter(flat)
    layers = {name: (next(it), next(it)) for name in _param_order(spec)}

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
    return jnp.concatenate([rgb, sigma], -1).astype(jnp.float32)


def reference_forward_raw(spec: MlpSpec, flat, x_raw: jnp.ndarray) -> jnp.ndarray:
    """jnp oracle: identical math to the kernels (tests + sanity)."""
    pos_f, dir_f = _spec_freqs(spec)
    mats = [jnp.asarray(m) for m in (*encoding_matrices(3, pos_f),
                                     *encoding_matrices(3, dir_f))]
    mats = (mats[0], mats[1], mats[2], mats[3])
    return _tile_forward(spec, mats, flat, x_raw)


def _weight_specs(flat):
    return [pl.BlockSpec(tuple(p.shape), lambda i, nd=p.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM) for p in flat]


def _pallas_forward(spec: MlpSpec, enc_mats, flat, x: jnp.ndarray,
                    interpret: bool) -> jnp.ndarray:
    N = x.shape[0]
    pad_n = (-N) % _TILE_FWD
    x_p = jnp.pad(x.astype(jnp.float32), ((0, pad_n), (0, 0)))
    Np = N + pad_n
    n_const = len(enc_mats) + len(flat)

    def kernel(*refs):
        x_ref = refs[0]
        mats = tuple(refs[1 + i][:] for i in range(4))
        flat_w = [refs[5 + i][:] for i in range(len(flat))]
        out_ref = refs[1 + n_const]
        out_ref[:] = _tile_forward(spec, mats, flat_w, x_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, 4), jnp.float32),
        grid=(Np // _TILE_FWD,),
        in_specs=[pl.BlockSpec((_TILE_FWD, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(enc_mats) + _weight_specs(flat),
        out_specs=pl.BlockSpec((_TILE_FWD, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_p, *enc_mats, *flat)
    return out[:N]


def _pallas_backward(spec: MlpSpec, enc_mats, flat, x: jnp.ndarray,
                     g: jnp.ndarray, interpret: bool):
    """Fused backward: recompute-forward + tile VJP per grid step; dW/db
    accumulate into VMEM-resident output blocks revisited by every step."""
    N = x.shape[0]
    pad_n = (-N) % _TILE_BWD
    x_p = jnp.pad(x.astype(jnp.float32), ((0, pad_n), (0, 0)))
    g_p = jnp.pad(g.astype(jnp.float32), ((0, pad_n), (0, 0)))
    Np = N + pad_n
    n_w = len(flat)

    def kernel(*refs):
        x_ref, g_ref = refs[0], refs[1]
        mats = tuple(refs[2 + i][:] for i in range(4))
        flat_w = [refs[6 + i][:] for i in range(n_w)]
        dx_ref = refs[6 + n_w]
        dw_refs = refs[7 + n_w:]

        _, vjp = jax.vjp(
            lambda f, xx: _tile_forward(spec, mats, f, xx), flat_w, x_ref[:])
        dflat, dx = vjp(g_ref[:])
        dx_ref[:] = dx

        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r, d in zip(dw_refs, dflat):
                r[:] = d.astype(jnp.float32)

        @pl.when(step != 0)
        def _acc():
            for r, d in zip(dw_refs, dflat):
                r[:] = r[:] + d.astype(jnp.float32)

    dw_shapes = [jax.ShapeDtypeStruct(tuple(p.shape), jnp.float32) for p in flat]
    dw_specs = [pl.BlockSpec(tuple(p.shape), lambda i, nd=p.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM) for p in flat]
    dx, *dws = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((Np, x.shape[1]), jnp.float32)] + dw_shapes,
        grid=(Np // _TILE_BWD,),
        in_specs=[pl.BlockSpec((_TILE_BWD, x.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_TILE_BWD, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + _weight_specs(enc_mats) + _weight_specs(flat),
        out_specs=[pl.BlockSpec((_TILE_BWD, x.shape[1]), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] + dw_specs,
        interpret=interpret,
    )(x_p, g_p, *enc_mats, *flat)
    dflat = tuple(d.astype(p.dtype) for d, p in zip(dws, flat))
    return dflat, dx[:N]


def _enc_mats(spec: MlpSpec):
    pos_f, dir_f = _spec_freqs(spec)
    Mp, Pp = encoding_matrices(3, pos_f)
    Md, Pd = encoding_matrices(3, dir_f)
    return (jnp.asarray(Mp), jnp.asarray(Pp), jnp.asarray(Md), jnp.asarray(Pd))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_mlp_v2(spec: MlpSpec, flat, x_raw):
    interpret = jax.default_backend() != "tpu"
    return _pallas_forward(spec, _enc_mats(spec), flat, x_raw, interpret)


def _v2_fwd(spec, flat, x_raw):
    return _fused_mlp_v2(spec, flat, x_raw), (flat, x_raw)


def _v2_bwd(spec, res, g):
    flat, x_raw = res
    interpret = jax.default_backend() != "tpu"
    dflat, dx = _pallas_backward(spec, _enc_mats(spec), flat, x_raw, g, interpret)
    return dflat, dx


_fused_mlp_v2.defvjp(_v2_fwd, _v2_bwd)


_SCOPED_VMEM_BYTES = 16 * 1024 * 1024


def vmem_feasible(spec: MlpSpec) -> bool:
    """Both v2 kernels keep ALL weights (and, backward, all dW accumulators)
    VMEM-resident — feasible for the reference's W=256 nets, structurally NOT
    for W≥1024 (11 f32 1024² blocks ≈ 44 MB vs the 16 MB scoped VMEM limit;
    measured on-chip round 3, RESULTS.md roofline table). Estimate the
    backward's weights + dW + one activation tile and compare."""
    w = spec.width
    per_layer = w * w + w
    n_dense = 2 + spec.n_layers - 1 + 4  # in/skip chain + heads, upper bound
    weight_bytes = 4 * n_dense * per_layer
    tile_bytes = 4 * _TILE_BWD * (spec.additional_input_dim + 6
                                  + spec.positions_dim + 2 * w)
    return 2 * weight_bytes + tile_bytes < int(0.85 * _SCOPED_VMEM_BYTES)


def fused_apply_raw(spec: MlpSpec, flax_params, x_raw: jnp.ndarray) -> jnp.ndarray:
    """Apply the net to RAW rows [N, additional || xyz(3) || unit dir(3)]."""
    if not vmem_feasible(spec):
        raise ValueError(
            f"fused MLP v2 needs VMEM-resident weights + dW accumulators; "
            f"width={spec.width} exceeds the ~16 MB scoped VMEM budget "
            "(fails to compile on real TPU). Use --use_fused_mlp=0 or 1 at "
            "this width — on this silicon plain XLA is fastest there anyway "
            "(RESULTS.md roofline).")
    return _fused_mlp_v2(spec, flatten_params(spec, flax_params), x_raw)


def supports(spec: MlpSpec, pos_encoder, dir_encoder) -> bool:
    """v2 handles 3-coord sin/cos encoders without identity blocks, at widths
    whose weights + dW accumulators fit scoped VMEM (see vmem_feasible)."""
    return (not pos_encoder.include_identity
            and not dir_encoder.include_identity
            and pos_encoder.number_frequencies * 6 == spec.positions_dim
            and dir_encoder.number_frequencies * 6 == spec.directions_dim
            and vmem_feasible(spec))
