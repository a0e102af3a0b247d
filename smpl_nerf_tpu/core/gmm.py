"""Isotropic Gaussian-mixture density over SMPL vertices + the modified softmax.

GaussianMixture reproduces /root/reference/utils.py:72-111 (density prior used by
the optional GMM loss, reference solver/smpl_nerf_solver.py:39-41). The log-space
form avoids the reference's [B, S, 6890] broadcast materialization: we compute
squared distances via the ||x||^2 - 2<x,mu> + ||mu||^2 expansion so the inner
term is one [B*S, 3] x [3, V] matmul on the MXU.

modified_softmax reproduces /root/reference/utils.py:57-60: an exp-shifted
softmax that maps zero activations to exactly zero weight (used by the dynamic
vertex-attention warp).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def modified_softmax(x: jnp.ndarray) -> jnp.ndarray:
    """Softmax variant with f(0) = 0: (exp(x - max) - exp(-max)) / sum(exp(x - max))."""
    x_max = jnp.max(x)
    exp = jnp.exp(x - x_max)
    return (exp - jnp.exp(-x_max)) / jnp.sum(exp, -1, keepdims=True)


class GaussianMixture:
    """Equal-weight isotropic GMM with means at the canonical SMPL vertices."""

    def __init__(self, means: np.ndarray, std: float):
        self.means = jnp.asarray(means, jnp.float32)           # [V, D]
        self.var = float(std) ** 2
        dim = self.means.shape[-1]
        cov_det = self.var ** dim
        self.factor = 1.0 / np.sqrt((2 * np.pi) ** dim * cov_det)

    def pdf(self, samples: jnp.ndarray) -> jnp.ndarray:
        """samples [..., D] -> mixture density [...]."""
        if samples.shape[-1] != self.means.shape[-1]:
            raise ValueError(
                f"sample dim {samples.shape[-1]} != gaussian dim {self.means.shape[-1]}")
        flat = samples.reshape(-1, samples.shape[-1])
        # squared distances via matmul (MXU) instead of a [..., V, D] broadcast
        x2 = jnp.sum(flat ** 2, -1, keepdims=True)             # [N, 1]
        mu2 = jnp.sum(self.means ** 2, -1)                     # [V]
        import jax
        cross = jnp.matmul(flat, self.means.T,
                           precision=jax.lax.Precision.HIGHEST)  # [N, V]
        sq = x2 - 2.0 * cross + mu2[None, :]
        probs = self.factor * jnp.exp(-0.5 * sq / self.var)
        mixture = jnp.sum(probs, -1) / self.means.shape[0]
        return mixture.reshape(samples.shape[:-1])
