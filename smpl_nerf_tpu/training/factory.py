"""Model factory: model_type -> flax modules + initialized params.

Mirrors the construction recipe of the reference's train.py:102-269 (encoder
output dims * 3 coords feed the nets; per-variant additional input dims;
estimator / warp-field / vertex nets per family) but as one table-driven
factory instead of a 160-line elif chain.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from smpl_nerf_tpu.models import (DummyImageWiseEstimator,
                                  DummySmplEstimatorModel, RenderRayNet,
                                  SirenRenderRayNet, SmplEstimator, WarpFieldNet)
from smpl_nerf_tpu.pipelines import build_encoders


class VertexEmbedder(nn.Module):
    """Embeds the flattened goal-mesh vertex cloud once per ray.

    TPU-native replacement for the reference's in-trunk vertices_net
    (append_vertices_net.py:30-33): the embedding depends only on the vertices,
    so it is computed per ray (not per sample) and concatenated as a small
    additional input to the standard RenderRayNet.
    """
    width: int = 256
    embedding_dim: int = 64
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, verts_flat: jnp.ndarray) -> jnp.ndarray:
        o = verts_flat.astype(self.dtype)
        for i in range(self.depth - 1):
            o = nn.relu(nn.Dense(self.width, name=f"embed_{i}", dtype=self.dtype)(o))
        o = nn.relu(nn.Dense(self.embedding_dim, name="embed_out", dtype=self.dtype)(o))
        return o.astype(jnp.float32)


def _net_cls(args):
    return SirenRenderRayNet if int(getattr(args, "siren", 0)) else RenderRayNet


def build_models_and_params(args, rng: jax.Array, extras: Optional[Dict[str, Any]] = None
                            ) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Returns (models, params, encoders_dict).

    extras: dataset-dependent constants: 'goal_poses' [N_img, 69] and 'betas'
    for the dummy estimators, 'num_vertices' for the vertex embedder,
    'canonical_pose'/'ground_truth_pose' for image_wise.
    """
    extras = extras or {}
    encoders = build_encoders(args)
    pos_dim = encoders["position"].output_dim * 3
    dir_dim = encoders["direction"].output_dim * 3
    pose_out = encoders["human_pose"].output_dim
    human_pose_dim = pose_out if int(args.human_pose_encoding) else 1
    dtype = jnp.bfloat16 if getattr(args, "compute_dtype", "float32") == "bfloat16" \
        else jnp.float32
    cls = _net_cls(args)
    model_type = args.model_type

    additional = 0
    if model_type == "append_to_nerf":
        additional = human_pose_dim * 2
    elif model_type == "append_smpl_params":
        additional = human_pose_dim * 69
    elif model_type == "append_vertex_locations_to_nerf":
        additional = int(extras.get("vertex_embedding_dim", 64))

    models: Dict[str, Any] = {}
    if int(getattr(args, "grid_encoding", 0) or 0):
        # beyond-reference: multi-res dense-grid encoder + tiny MLP head
        # (models/grid_nerf.py) — same output contract as RenderRayNet
        from smpl_nerf_tpu.models.grid_nerf import GridNerf
        levels = tuple(int(r) for r in
                       str(getattr(args, "grid_levels", "8,16,32,64")).split(","))
        grid_kw = dict(
            levels=levels, features=int(getattr(args, "grid_features", 4)),
            width=int(getattr(args, "grid_width", 64)),
            n_layers=int(getattr(args, "grid_depth", 3)),
            dir_freqs=int(args.number_frequencies_directional),
            additional_input_dim=additional,
            bound=float(getattr(args, "grid_bound", 1.6)), dtype=dtype)
        models["model_coarse"] = GridNerf(**grid_kw)
        models["model_fine"] = GridNerf(**grid_kw)
    else:
        models["model_coarse"] = cls(
            n_layers=int(args.netdepth), width=int(args.netwidth),
            positions_dim=pos_dim, directions_dim=dir_dim,
            additional_input_dim=additional, skips=tuple(int(s) for s in args.skips),
            use_directional_input=bool(int(args.use_directional_input)), dtype=dtype)
        models["model_fine"] = cls(
            n_layers=int(args.netdepth_fine), width=int(args.netwidth_fine),
            positions_dim=pos_dim, directions_dim=dir_dim,
            additional_input_dim=additional, skips=tuple(int(s) for s in args.skips_fine),
            use_directional_input=bool(int(args.use_directional_input)), dtype=dtype)

    if model_type in ("smpl_nerf", "warp"):
        warp_pos_dim = (encoders["position"].output_dim
                        if int(args.human_pose_encoding) else 1) * 3
        models["model_warp_field"] = WarpFieldNet(
            width=int(args.netwidth_warp), positions_dim=warp_pos_dim,
            pose_dim=human_pose_dim * 2, dtype=dtype)
    if model_type == "smpl_estimator":
        models["smpl_estimator"] = SmplEstimator(human_size=len(args.human_joints))
    if model_type in ("dummy_dynamic", "append_vertex_locations_to_nerf"):
        models["smpl_estimator"] = DummySmplEstimatorModel(
            goal_poses=np.asarray(extras["goal_poses"], np.float32).reshape(-1, 69),
            betas=np.asarray(extras["betas"], np.float32))
    if model_type == "image_wise_dynamic":
        models["smpl_estimator"] = DummyImageWiseEstimator(
            canonical_pose=np.asarray(extras.get("canonical_pose", np.zeros(69)),
                                      np.float32),
            initial_arm_angle_l=float(extras.get("initial_arm_angle_l", 0.0)),
            initial_arm_angle_r=float(extras.get("initial_arm_angle_r", 0.0)),
            ground_truth_pose=extras.get("ground_truth_pose"))
    if model_type == "append_vertex_locations_to_nerf":
        models["vertex_embedder"] = VertexEmbedder(
            width=int(args.netwidth),
            embedding_dim=int(extras.get("vertex_embedding_dim", 64)))

    # ---- init params -------------------------------------------------------
    params: Dict[str, Any] = {}
    keys = jax.random.split(rng, len(models) + 1)
    key_iter = iter(keys)

    if getattr(models["model_coarse"], "takes_raw", False):
        mlp_in = additional + 6  # raw rows: [prefix || xyz || unit dir]
    else:
        mlp_in = pos_dim + additional + dir_dim
    dummy = jnp.zeros((2, mlp_in), jnp.float32)
    params["model_coarse"] = models["model_coarse"].init(next(key_iter), dummy)
    params["model_fine"] = models["model_fine"].init(next(key_iter), dummy)
    if "model_warp_field" in models:
        warp_in = models["model_warp_field"].positions_dim + models["model_warp_field"].pose_dim
        params["model_warp_field"] = models["model_warp_field"].init(
            next(key_iter), jnp.zeros((2, warp_in), jnp.float32))
    if "smpl_estimator" in models:
        est = models["smpl_estimator"]
        if isinstance(est, SmplEstimator):
            size = extras.get("image_size", 128)  # 5 maxpools -> min 32/side
            h, w = (size, size) if np.isscalar(size) else size
            params["smpl_estimator"] = est.init(
                next(key_iter), jnp.zeros((1, int(h), int(w), 3), jnp.float32))
        elif isinstance(est, DummySmplEstimatorModel):
            params["smpl_estimator"] = est.init(next(key_iter), jnp.asarray([0]))
        else:  # DummyImageWiseEstimator
            params["smpl_estimator"] = est.init(next(key_iter))
    if "vertex_embedder" in models:
        nv = int(extras["num_vertices"])
        params["vertex_embedder"] = models["vertex_embedder"].init(
            next(key_iter), jnp.zeros((2, nv * 3), jnp.float32))
    return models, params, encoders
