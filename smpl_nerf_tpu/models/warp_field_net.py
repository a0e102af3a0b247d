"""Ray-bending warp field MLP.

Mirrors the reference WarpFieldNet (/root/reference/models/warp_field_net.py:6-39):
a 2-layer MLP Linear(pos_enc+pose_enc -> W) -> ReLU -> Linear(W -> 3) predicting a
per-sample 3D warp vector conditioned on encoded sample position + encoded human
pose. (The reference accepts an `n_layers` arg but its depth is fixed at 2; we
keep the two-layer contract and name the arg for config compatibility only.)
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class WarpFieldNet(nn.Module):
    width: int = 256
    positions_dim: int = 60
    pose_dim: int = 24
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        o = nn.Dense(self.width, name="linear1", dtype=self.dtype)(x.astype(self.dtype))
        o = nn.relu(o)
        o = nn.Dense(3, name="linear2", dtype=self.dtype)(o)
        return o.astype(jnp.float32)


def import_torch_state_dict(state_dict) -> dict:
    import numpy as np
    return {"params": {
        "linear1": {"kernel": np.asarray(state_dict["linear1.weight"]).T,
                    "bias": np.asarray(state_dict["linear1.bias"])},
        "linear2": {"kernel": np.asarray(state_dict["linear2.weight"]).T,
                    "bias": np.asarray(state_dict["linear2.bias"])},
    }}


def export_torch_state_dict(params: dict) -> dict:
    """Inverse of import_torch_state_dict (numpy arrays, reference layout)."""
    import numpy as np
    p = params.get("params", params)
    return {
        "linear1.weight": np.asarray(p["linear1"]["kernel"]).T.copy(),
        "linear1.bias": np.asarray(p["linear1"]["bias"]).copy(),
        "linear2.weight": np.asarray(p["linear2"]["kernel"]).T.copy(),
        "linear2.bias": np.asarray(p["linear2"]["bias"]).copy(),
    }
