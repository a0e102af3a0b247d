"""CNN pose regressor: 128x128 RGB image -> `human_size` SMPL joint angles.

Mirrors the reference SmplEstimator (/root/reference/models/smpl_estimator.py:6-65):
5 conv+BN+ReLU blocks (16->32->64->128->128 channels) each followed by 2x2
maxpool down to 4x4 spatial (the reference reaches 8x8 after 4 pools on 128
inputs then pools once more), FC 8192 -> 500 -> human_size with dropout 0.25.

TPU notes: NHWC layout (XLA's native conv layout on TPU), flax BatchNorm with
running stats carried in a separate 'batch_stats' collection.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SmplEstimator(nn.Module):
    human_size: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [N, H, W, 3] in [0, 1] -> [N, human_size] joint angles (radians)."""
        widths = [16, 32, 64, 128, 128]
        o = x.astype(self.dtype)
        for i, w in enumerate(widths):
            o = nn.Conv(w, (3, 3), padding="SAME", name=f"conv{i}", dtype=self.dtype)(o)
            o = nn.BatchNorm(use_running_average=not train, name=f"bn{i}",
                             dtype=self.dtype)(o)
            o = nn.relu(o)
            o = nn.max_pool(o, (2, 2), strides=(2, 2))
        o = o.reshape(o.shape[0], -1)
        o = nn.relu(nn.Dense(500, name="fc1", dtype=self.dtype)(o))
        o = nn.Dropout(0.25, deterministic=not train)(o)
        o = nn.Dense(self.human_size, name="fc2", dtype=self.dtype)(o)
        return o.astype(jnp.float32)
