"""Tensor parallelism: width-shard the NeRF MLPs over the mesh 'model' axis.

The reference is single-device (SURVEY §2.9); the provisioned ('data','model')
mesh gains a real user here: RenderRayNet trunk Dense kernels are stored and
computed column-sharded (outputs split over 'model'), biases likewise; heads
stay replicated. The XLA SPMD partitioner propagates the activation shardings
and inserts the all-gathers/reduce-scatters — there is no hand-written
collective. At the reference's W=256 this is a capability (and a correctness
surface we test on a 4x2 CPU mesh); the wins appear at W>=1024 where a single
chip's MXU tiles saturate.

Enable with --tensor_parallel=1 and a mesh like --mesh_shape=4,2.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_TRUNK_PREFIXES = ("positions_pose_input", "positional_net",
                   "additional_linear_layer", "directional_input",
                   "directional_net")


def tp_param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a params pytree: MLP widths split over 'model'.

    Applies to the 'model_coarse'/'model_fine' RenderRayNet trees; everything
    else (warp field, estimators, embedders — all tiny) stays replicated.
    """
    n_model = int(mesh.shape["model"])

    def spec_for(path, leaf) -> P:
        if n_model <= 1:
            return P()
        keys = [getattr(p, "key", str(p)) for p in path]
        if not keys or keys[0] not in ("model_coarse", "model_fine"):
            return P()
        layer = keys[-2] if len(keys) >= 2 else ""
        if not layer.startswith(_TRUNK_PREFIXES):
            return P()  # sigma/rgb heads replicated
        if keys[-1] == "kernel" and leaf.ndim == 2 and leaf.shape[1] % n_model == 0:
            return P(None, "model")
        if keys[-1] == "bias" and leaf.shape[0] % n_model == 0:
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for(path, leaf)), params)


def place_params_tp(params, mesh: Mesh):
    """Device-put a params tree with width-sharded MLP kernels."""
    return jax.tree.map(jax.device_put, params, tp_param_shardings(params, mesh))
