"""NeRF positional encoding.

Same output layout as the reference PositionalEncoder (/root/reference/utils.py:114-131):
frequency bands 2^0 .. 2^(L-1); concatenation order is
[identity?, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] where each block spans
the full input dimension. `output_dim` counts blocks per scalar (2L (+1 identity)).

TPU note: instead of a Python list of lambdas we build the whole encoding as one
broadcasted multiply + sin/cos pair, which XLA fuses into the downstream matmul's
producer epilogue.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class PositionalEncoder:
    def __init__(self, number_frequencies: int, include_identity: bool):
        self.number_frequencies = int(number_frequencies)
        self.include_identity = bool(include_identity)
        self.output_dim = (1 if include_identity else 0) + 2 * self.number_frequencies
        if self.number_frequencies > 0:
            self.freq_bands = np.power(
                2.0, np.linspace(0.0, self.number_frequencies - 1, self.number_frequencies)
            ).astype(np.float32)
        else:
            self.freq_bands = np.zeros((0,), np.float32)

    def encode(self, coordinate: jnp.ndarray) -> jnp.ndarray:
        """coordinate [..., D] -> [..., D * output_dim] in reference block order."""
        parts = []
        if self.include_identity:
            parts.append(coordinate)
        if self.number_frequencies > 0:
            freqs = jnp.asarray(self.freq_bands)
            # [..., F, D]: scale per-frequency, then interleave sin/cos blocks
            scaled = coordinate[..., None, :] * freqs[:, None]
            sin = jnp.sin(scaled)
            cos = jnp.cos(scaled)
            # [..., F, 2, D] -> [..., F*2*D] gives [sin f0 | cos f0 | sin f1 | ...]
            interleaved = jnp.stack([sin, cos], axis=-2)
            parts.append(interleaved.reshape(*coordinate.shape[:-1], -1))
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    def __call__(self, coordinate: jnp.ndarray) -> jnp.ndarray:
        return self.encode(coordinate)
