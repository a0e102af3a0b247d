"""RenderRayNet variant with an SMPL-vertex embedding sub-network.

The reference AppendVerticesNet (/root/reference/models/append_vertices_net.py:6-84)
embeds all 6890*3 SMPL vertex coordinates through a small MLP — but then never
fuses the embedding into the trunk (its forward computes `verts` and drops it;
documented as a dead branch in SURVEY.md §2.3). We implement the *intended*
behaviour: the vertex embedding is concatenated with the positional input before
the trunk, which makes the vertex conditioning actually effective. The input
layout contract is [positions || vertices(flat) || directions], matching the
reference pipeline (models/append_vertices_pipeline.py:29-58).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class AppendVerticesNet(nn.Module):
    n_layers: int = 8
    width: int = 256
    positions_dim: int = 60
    directions_dim: int = 24
    vertices_dim: int = 6890 * 3
    vertex_embedding_dim: int = 64
    vertices_net_depth: int = 2
    skips: Sequence[int] = (4,)
    use_directional_input: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        positions = x[..., :self.positions_dim]
        vertices = x[..., self.positions_dim:self.positions_dim + self.vertices_dim]
        directions = x[..., -self.directions_dim:]

        # vertex embedding sub-net (reference: vertices_net, append_vertices_net.py:30-33)
        v = vertices.astype(self.dtype)
        for i in range(self.vertices_net_depth):
            v = nn.relu(nn.Dense(self.vertex_embedding_dim if i == self.vertices_net_depth - 1
                                 else self.width, name=f"vertices_net_{i}", dtype=self.dtype)(v))

        trunk_in = jnp.concatenate([positions.astype(self.dtype), v], -1)
        o = nn.relu(nn.Dense(self.width, name="positions_pose_input", dtype=self.dtype)(trunk_in))
        for i in range(self.n_layers - 1):
            if i in self.skips:
                o = jnp.concatenate([o, trunk_in], -1)
            o = nn.relu(nn.Dense(self.width, name=f"positional_net_{i}", dtype=self.dtype)(o))
        o = nn.Dense(self.width, name="additional_linear_layer", dtype=self.dtype)(o)
        sigma = nn.Dense(1, name="sigma_out_layer", dtype=self.dtype)(o)

        directional_width = self.width // 2
        if self.use_directional_input:
            o = jnp.concatenate([o, directions.astype(self.dtype)], -1)
        o = nn.Dense(directional_width, name="directional_input", dtype=self.dtype)(o)
        o = nn.relu(nn.Dense(directional_width, name="directional_net_0", dtype=self.dtype)(o))
        rgb = nn.Dense(3, name="rgb_out_layer", dtype=self.dtype)(o)
        return jnp.concatenate([rgb, sigma], -1).astype(jnp.float32)
