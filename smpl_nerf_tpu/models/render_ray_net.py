"""The NeRF MLP (RenderRayNet) and its SIREN variant.

Layer topology mirrors the reference (/root/reference/models/render_ray_net.py:6-79)
so torch checkpoints can be imported 1:1 for PSNR-parity checks:

  input [positions(+additional) || directions]
  -> Linear(pos+add -> W) + ReLU                        (positions_pose_input)
  -> (n_layers-1) x Linear(W -> W) + ReLU, with skip-concat of the raw
     positions(+additional) input at layer indices in `skips`
  -> Linear(W -> W), NO activation                      (additional_linear_layer)
  -> sigma head Linear(W -> 1)
  -> directional branch Linear(W + dir -> W/2)          (gated by use_directional_input)
  -> 1 x Linear(W/2 -> W/2) + ReLU
  -> rgb head Linear(W/2 -> 3)
  output [rgb, sigma] raw (activations live in core.integrate.raw2outputs).

TPU notes: the hot path is the [B*S, W] matmul chain -> MXU. `dtype` lets the
chain run in bfloat16 (params stay float32; outputs are cast back) — W=256 tiles
the 128x128 MXU exactly. The SIREN variant (sin activations, omega_0=30 scaling,
uniform +-sqrt(6/fan_in)/omega init) fills the gap the reference left: train.py:18
imports a `SirenRenderRayNet` whose file is missing from the repo.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class RenderRayNet(nn.Module):
    n_layers: int = 8
    width: int = 256
    positions_dim: int = 60
    directions_dim: int = 24
    additional_input_dim: int = 0
    skips: Sequence[int] = (4,)
    use_directional_input: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pos_dim = self.positions_dim + self.additional_input_dim
        positions_pose = x[..., :pos_dim]
        directions = x[..., -self.directions_dim:]
        compute = lambda a: a.astype(self.dtype)

        o = nn.relu(nn.Dense(self.width, name="positions_pose_input",
                             dtype=self.dtype)(compute(positions_pose)))
        for i in range(self.n_layers - 1):
            if i in self.skips:
                o = jnp.concatenate([o, compute(positions_pose)], -1)
            o = nn.relu(nn.Dense(self.width, name=f"positional_net_{i}", dtype=self.dtype)(o))
        o = nn.Dense(self.width, name="additional_linear_layer", dtype=self.dtype)(o)
        sigma = nn.Dense(1, name="sigma_out_layer", dtype=self.dtype)(o)

        directional_width = self.width // 2
        if self.use_directional_input:
            o = jnp.concatenate([o, compute(directions)], -1)
        o = nn.Dense(directional_width, name="directional_input", dtype=self.dtype)(o)
        o = nn.relu(nn.Dense(directional_width, name="directional_net_0", dtype=self.dtype)(o))
        rgb = nn.Dense(3, name="rgb_out_layer", dtype=self.dtype)(o)
        return jnp.concatenate([rgb, sigma], -1).astype(jnp.float32)


class _Sine(nn.Module):
    omega_0: float = 30.0

    @nn.compact
    def __call__(self, x):
        return jnp.sin(self.omega_0 * x)


def _siren_init(omega_0: float, is_first: bool):
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        if is_first:
            bound = 1.0 / fan_in
        else:
            bound = np.sqrt(6.0 / fan_in) / omega_0
        import jax
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SirenRenderRayNet(nn.Module):
    """SIREN-activation RenderRayNet (honors the reference's --siren flag).

    The reference's models/siren_net.py is missing from its repo (train.py:18-19
    imports crash); this implements the intended variant: the positional trunk
    uses sin(omega_0 * x) activations with the SIREN init scheme (Sitzmann et
    al. 2020); heads and the directional branch keep the reference topology.
    """
    n_layers: int = 8
    width: int = 256
    positions_dim: int = 60
    directions_dim: int = 24
    additional_input_dim: int = 0
    skips: Sequence[int] = ()
    use_directional_input: bool = True
    omega_0: float = 30.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pos_dim = self.positions_dim + self.additional_input_dim
        positions_pose = x[..., :pos_dim]
        directions = x[..., -self.directions_dim:]
        sine = lambda a: jnp.sin(self.omega_0 * a)

        o = sine(nn.Dense(self.width, name="positions_pose_input", dtype=self.dtype,
                          kernel_init=_siren_init(self.omega_0, True))(
                              positions_pose.astype(self.dtype)))
        for i in range(self.n_layers - 1):
            if i in self.skips:
                o = jnp.concatenate([o, positions_pose.astype(self.dtype)], -1)
            o = sine(nn.Dense(self.width, name=f"positional_net_{i}", dtype=self.dtype,
                              kernel_init=_siren_init(self.omega_0, False))(o))
        o = nn.Dense(self.width, name="additional_linear_layer", dtype=self.dtype,
                     kernel_init=_siren_init(self.omega_0, False))(o)
        sigma = nn.Dense(1, name="sigma_out_layer", dtype=self.dtype)(o)

        directional_width = self.width // 2
        if self.use_directional_input:
            o = jnp.concatenate([o, directions.astype(self.dtype)], -1)
        o = nn.Dense(directional_width, name="directional_input", dtype=self.dtype)(o)
        o = sine(nn.Dense(directional_width, name="directional_net_0", dtype=self.dtype,
                          kernel_init=_siren_init(self.omega_0, False))(o))
        rgb = nn.Dense(3, name="rgb_out_layer", dtype=self.dtype)(o)
        return jnp.concatenate([rgb, sigma], -1).astype(jnp.float32)


def import_torch_state_dict(state_dict, n_layers: int = 8) -> dict:
    """Convert a reference torch RenderRayNet state_dict into flax params.

    Torch Linear stores weight [out, in]; flax Dense kernel is [in, out].
    Layer names follow the reference module attributes
    (models/render_ray_net.py:19-40).
    """
    import numpy as np

    def wb(prefix):
        w = np.asarray(state_dict[prefix + ".weight"]).T
        b = np.asarray(state_dict[prefix + ".bias"])
        return {"kernel": w, "bias": b}

    params = {
        "positions_pose_input": wb("positions_pose_input"),
        "additional_linear_layer": wb("additional_linear_layer"),
        "sigma_out_layer": wb("sigma_out_layer"),
        "directional_input": wb("directional_input"),
        "directional_net_0": wb("directional_net.0"),
        "rgb_out_layer": wb("rgb_out_layer"),
    }
    for i in range(n_layers - 1):
        params[f"positional_net_{i}"] = wb(f"positional_net.{i}")
    return {"params": params}


def export_torch_state_dict(params: dict, n_layers: int = 8) -> dict:
    """Inverse of import_torch_state_dict: flax params -> reference-layout
    torch state_dict arrays (numpy; call torch.tensor() per value to load).

    Completes the migration story both ways: checkpoints trained here can be
    loaded into the reference's RenderRayNet (models/render_ray_net.py:19-40)
    for cross-framework validation.
    """
    import numpy as np

    p = params.get("params", params)

    def wb(ours, theirs, out):
        out[theirs + ".weight"] = np.asarray(p[ours]["kernel"]).T.copy()
        out[theirs + ".bias"] = np.asarray(p[ours]["bias"]).copy()

    sd: dict = {}
    wb("positions_pose_input", "positions_pose_input", sd)
    for i in range(n_layers - 1):
        wb(f"positional_net_{i}", f"positional_net.{i}", sd)
    wb("additional_linear_layer", "additional_linear_layer", sd)
    wb("sigma_out_layer", "sigma_out_layer", sd)
    wb("directional_input", "directional_input", sd)
    wb("directional_net_0", "directional_net.0", sd)
    wb("rgb_out_layer", "rgb_out_layer", sd)
    return sd
