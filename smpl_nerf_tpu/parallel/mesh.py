"""Device mesh & sharding layer.

The reference is strictly single-device (SURVEY.md §2.9: no DDP/NCCL/MPI
anywhere). The TPU-native scaling axis is the ray megabatch: rays are
embarrassingly parallel, parameters are tiny (~1.2M floats), so the layout is

  * batch arrays sharded over the 'data' mesh axis (leading dim),
  * params/optimizer state replicated,
  * the psum of gradients inserted automatically by jit from the sharding
    specs, riding ICI within a slice.

A second 'model' axis is provisioned for width-sharded MLPs (rarely worth it at
W=256, but the mesh API supports '4,2'-style shapes). Pipeline parallelism is
pointless at the reference's 8-layer/W=256 shape, but parallel/pp.py provides
the GPipe-style depth-sharded trunk for the deep/wide regime where it isn't.

Multi-host: call jax.distributed.initialize() before make_mesh and the same
code runs across hosts — jax.devices() then spans the pod and per-host batches
are assembled with jax.make_array_from_process_local_data.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: str = "", devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh.

    mesh_shape: '' = all devices on the data axis; '8' = 8-way data;
    '4,2' = 4-way data x 2-way model.
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape:
        dims = tuple(int(x) for x in mesh_shape.split(","))
        if len(dims) == 1:
            dims = (dims[0], 1)
    else:
        dims = (len(devices), 1)
    n = dims[0] * dims[1]
    if n > len(devices):
        raise ValueError(f"mesh {dims} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(dims)
    return Mesh(dev_array, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every batch array with its leading axis sharded over 'data'.

    '_itable' keys (whole per-image tables the pipeline indexes itself,
    training.solver.gather_batch) are replicated: their leading axis is
    N_images, not rays, and need not divide the data axis."""
    sh = data_sharding(mesh)
    repl = replicate_sharding(mesh)
    return {k: jax.device_put(v, repl if k.endswith("_itable") else sh)
            for k, v in batch.items()}


def pad_to_multiple(n: int, k: int) -> int:
    """Smallest multiple of k >= n (batch padding so shards divide evenly)."""
    return ((n + k - 1) // k) * k
