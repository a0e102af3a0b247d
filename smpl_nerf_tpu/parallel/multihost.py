"""Multi-host batch assembly (TPU pod slices / multi-process CPU).

In multi-controller JAX every process runs the same program but can only
address its own devices. Host data therefore enters the global computation
through per-process assembly:

  * sharded ray batches: each process contributes exactly the rows that land
    on ITS devices (`jax.make_array_from_process_local_data`), so a batch is
    assembled without any cross-host device traffic — the SURVEY §2.9 plan.
  * replicated trees (params, optimizer state, masks): identical host values
    on every process, materialized per-device via `jax.make_array_from_callback`.

The reference has no distributed machinery at all (SURVEY §2.9); this module +
the mesh layer is the whole "communication backend": gradients psum over
ICI/DCN from the sharding specs alone.

Single-process this degrades to plain device_put semantics, so the solver uses
one code path.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding

from smpl_nerf_tpu.parallel import mesh as mesh_mod


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_row_range(sharding: NamedSharding, n_rows: int) -> Tuple[int, int]:
    """[lo, hi) rows of a leading-axis-sharded global array owned by this process.

    NamedSharding over the 'data' axis splits rows into contiguous per-device
    blocks in device order; a process owns the union of its addressable
    devices' blocks, which is contiguous for standard mesh layouts.
    """
    idx_map = sharding.addressable_devices_indices_map((n_rows,))
    # devices replicating rows along the 'model' axis yield DUPLICATE spans —
    # dedupe before checking tiling (a 2-D data x model mesh is the common case)
    spans = sorted({(s[0].start or 0, n_rows if s[0].stop is None else s[0].stop)
                    for s in idx_map.values()})
    lo, hi = spans[0][0], spans[-1][1]
    # unique spans must tile [lo, hi) exactly (gaps sum short, overlaps long)
    if sum(b - a for a, b in spans) != hi - lo:
        raise ValueError(f"non-contiguous local rows: {spans}")
    return lo, hi


def make_global_batch(batch_np: Dict[str, np.ndarray], mesh) -> dict:
    """Per-process local rows -> globally sharded batch arrays.

    batch_np holds the FULL batch rows (identical on every process — the index
    draw is seeded identically); each process uploads only its slice.
    """
    sh = mesh_mod.data_sharding(mesh)
    out = {}
    for k, v in batch_np.items():
        v = np.ascontiguousarray(v)
        lo, hi = local_row_range(sh, v.shape[0])
        out[k] = jax.make_array_from_process_local_data(sh, v[lo:hi], v.shape)
    return out


def put_tree(tree, shardings):
    """Place a host pytree on a (multi-host) mesh with per-leaf shardings.

    jax.make_array_from_callback materializes exactly the shards addressable
    by this process, so the same code replicates params on a 1-D mesh and
    width-shards them on a data x model mesh across hosts.
    """
    def put(x, sh):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree, shardings)


def put_replicated(tree, mesh):
    """Replicate a host pytree across every device of a (multi-host) mesh."""
    sh = mesh_mod.replicate_sharding(mesh)
    return put_tree(tree, jax.tree.map(lambda _: sh, tree))
