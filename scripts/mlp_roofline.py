#!/usr/bin/env python3
"""MLP roofline / chip-QoS microbench (VERDICT round-2 items #5 and #8).

Reproduces, as a rerunnable artifact, the round-1/2 evidence behind the perf
claims in CLAUDE.md: on the tunnelled bench chip the 8-deep W=256 relu-matmul
chain saturates ~20 TF/s no matter the implementation, while W=1024 reaches
~60 TF/s — so the fused-MLP kernels cannot win at the reference's W=256
(/root/reference/models/render_ray_net.py:42-61, the hot chain they fuse)
ON THIS SILICON, and any MFU claim must be read against the W-dependent cap.

Part A (`--part chain`):   sustained TF/s of the bare 8xW chain,
                           XLA vs a minimal per-layer Pallas matmul,
                           W in {256, 512, 1024}, best-of-N, host-synced.
Part B (`--part fusedmlp`): the real RenderRayNet fwd and fwd+bwd megabatch,
                           XLA apply vs fused v1 (ops/fused_mlp.py) vs
                           fused v2 in-kernel-encoding (ops/fused_mlp_v2.py),
                           W in {256, 1024}.

Run serially with nothing else on the TPU. Emits one JSON line per
measurement on stdout (table on stderr) so rounds can diff results.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smpl_nerf_tpu._platform import apply_platform_env

apply_platform_env()

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")


def _stderr(*a):
    print(*a, file=sys.stderr, flush=True)


def _best_seconds(fn, reps: int) -> float:
    """Best-of-N wall time of fn() with an honest host sync (the axon tunnel
    makes block_until_ready a no-op; fn must return a small array)."""
    np.asarray(fn())  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _emit(record: dict):
    print(json.dumps(record), flush=True)


# ---------------------------------------------------------------- part A ----

def _pallas_layer(tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.nn.relu(
            jnp.dot(x_ref[:], w_ref[:],
                    preferred_element_type=jnp.float32)).astype(o_ref.dtype)

    def apply(x, w):
        n = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // tile,),
            in_specs=[pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(w.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, w.shape[1]), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, w.shape[1]), x.dtype),
            interpret=interpret,
        )(x, w)

    return apply


def bench_chain(widths, n_rows: int, depth: int, reps: int):
    interpret = jax.default_backend() != "tpu"
    for W in widths:
        key = jax.random.PRNGKey(0)
        ws = [0.05 * jax.random.normal(jax.random.fold_in(key, i), (W, W),
                                       jnp.bfloat16) for i in range(depth)]
        x = jax.random.normal(key, (n_rows, W), jnp.bfloat16)
        flops = 2 * n_rows * W * W * depth

        @jax.jit
        def xla_chain(x, ws=tuple(ws)):
            for w in ws:
                x = jax.nn.relu(jnp.dot(x, w, preferred_element_type=jnp.float32)
                                ).astype(jnp.bfloat16)
            return x.astype(jnp.float32).sum()

        layer = _pallas_layer(min(512, n_rows), interpret)

        @jax.jit
        def pallas_chain(x, ws=tuple(ws)):
            for w in ws:
                x = layer(x, w)
            return x.astype(jnp.float32).sum()

        for name, fn in (("xla", xla_chain), ("pallas", pallas_chain)):
            dt = _best_seconds(lambda f=fn: f(x), reps)
            tfs = flops / dt / 1e12
            _stderr(f"chain W={W:4d} {name:6s}: {dt*1e3:7.2f} ms  {tfs:6.1f} TF/s")
            _emit({"bench": "chain", "impl": name, "width": W,
                   "rows": n_rows, "depth": depth, "ms": round(dt * 1e3, 3),
                   "tflops_per_sec": round(tfs, 2)})


# ---------------------------------------------------------------- part B ----

def _build_net(width: int):
    from smpl_nerf_tpu.models.render_ray_net import RenderRayNet
    from smpl_nerf_tpu.ops import fused_mlp
    model = RenderRayNet(width=width, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, model.positions_dim + model.directions_dim)))
    spec = fused_mlp.spec_from_model(model)
    return model, params, spec


def bench_fused_mlp(widths, n_rows: int, reps: int):
    from smpl_nerf_tpu.ops import fused_mlp, fused_mlp_v2

    for W in widths:
        model, params, spec = _build_net(W)
        key = jax.random.PRNGKey(1)
        x_enc = jax.random.normal(key, (n_rows, spec.in_dim), jnp.float32)
        x_raw = jax.random.normal(key, (n_rows, fused_mlp_v2.raw_in_dim(spec)),
                                  jnp.float32)
        # FLOPs of the matmul chain per row (fwd); bwd ~2x fwd
        pos_in = spec.pos_block
        dims = [(pos_in, W)] + [(W + (pos_in if i in spec.skips else 0), W)
                                for i in range(spec.n_layers - 1)]
        dims += [(W, W), (W, 1), (W + spec.directions_dim, W // 2),
                 (W // 2, W // 2), (W // 2, 3)]
        flops_fwd = 2 * n_rows * sum(a * b for a, b in dims)

        impls = {
            "xla": (lambda p, x: model.apply(p, x), x_enc),
            "fused_v1": (lambda p, x: fused_mlp.fused_apply(spec, p, x), x_enc),
            "fused_v2": (lambda p, x: fused_mlp_v2.fused_apply_raw(spec, p, x),
                         x_raw),
        }
        for name, (apply_fn, x) in impls.items():
            fwd = jax.jit(lambda p, x, f=apply_fn: f(p, x).sum())

            def loss(p, x, f=apply_fn):
                return f(p, x).sum()

            fwdbwd = jax.jit(lambda p, x, l=loss: jax.tree_util.tree_reduce(
                lambda a, b: a + b.astype(jnp.float32).sum(),
                jax.grad(l)(p, x), jnp.float32(0.0)))
            try:
                t_f = _best_seconds(lambda: fwd(params, x), reps)
                t_fb = _best_seconds(lambda: fwdbwd(params, x), reps)
            except Exception as e:  # noqa: BLE001
                _stderr(f"fusedmlp W={W} {name}: FAILED {type(e).__name__}: {e}")
                continue
            _stderr(f"fusedmlp W={W:4d} {name:8s}: fwd {t_f*1e3:7.2f} ms "
                    f"({flops_fwd/t_f/1e12:5.1f} TF/s)   fwd+bwd {t_fb*1e3:7.2f} ms "
                    f"({3*flops_fwd/t_fb/1e12:5.1f} TF/s)")
            _emit({"bench": "fusedmlp", "impl": name, "width": W,
                   "rows": n_rows, "fwd_ms": round(t_f * 1e3, 3),
                   "fwdbwd_ms": round(t_fb * 1e3, 3),
                   "fwd_tflops_per_sec": round(flops_fwd / t_f / 1e12, 2),
                   "fwdbwd_tflops_per_sec": round(3 * flops_fwd / t_fb / 1e12, 2)})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["chain", "fusedmlp", "all"], default="all")
    ap.add_argument("--rows", type=int, default=131072,
                    help="megabatch rows (default: 2048 rays x 64 samples)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()
    _stderr(f"backend={jax.default_backend()} rows={args.rows}")
    if args.part in ("chain", "all"):
        bench_chain((256, 512, 1024), args.rows, args.depth, args.reps)
    if args.part in ("fusedmlp", "all"):
        bench_fused_mlp((256, 1024), args.rows, args.reps)


if __name__ == "__main__":
    main()
