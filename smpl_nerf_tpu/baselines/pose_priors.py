"""SMPLify pose priors (jnp).

Counterpart of the reference's vendored util/prior.py:36-231 (MPI-licensed
SMPLify code used by its legacy kaolin baseline):
  * MaxMixturePrior — negative log of a max over GMM components fit to mocap
    poses. The mixture DATA (gmm_08.pkl) is MPI-licensed and not shippable;
    the class loads a user-supplied file and is gated otherwise.
  * angle_prior / l2_prior — re-derived in baselines/silhouette_pose_fit.py and
    re-exported here.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import jax.numpy as jnp
import numpy as np

from smpl_nerf_tpu.baselines.silhouette_pose_fit import angle_prior  # noqa: F401


def l2_prior(pose: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(pose ** 2)


class MaxMixturePrior:
    """Max-of-gaussians pose prior over the 69-dim body pose.

    neg-log-likelihood of the best component:
      nll(pose) = min_k [ 0.5 (pose-mu_k)^T P_k (pose-mu_k) - log w_k + c_k ]
    with P_k the precision matrices. Loads SMPLify's gmm_XX.pkl layout
    {means [K,69], covars [K,69,69], weights [K]}.
    """

    def __init__(self, means: np.ndarray, covars: np.ndarray, weights: np.ndarray):
        self.means = jnp.asarray(means, jnp.float32)
        self.precisions = jnp.asarray(np.linalg.inv(covars), jnp.float32)
        logdets = np.linalg.slogdet(covars)[1]
        self.consts = jnp.asarray(0.5 * logdets - np.log(weights), jnp.float32)

    @classmethod
    def load(cls, path: str) -> Optional["MaxMixturePrior"]:
        if not path or not os.path.exists(path):
            return None
        with open(path, "rb") as fh:
            data = pickle.load(fh, encoding="latin1")
        return cls(np.asarray(data["means"]), np.asarray(data["covars"]),
                   np.asarray(data["weights"]).reshape(-1))

    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        """pose [69] (or [..., 69]) -> scalar (or [...]) neg-log-likelihood."""
        diff = pose[..., None, :] - self.means          # [..., K, 69]
        quad = 0.5 * jnp.einsum("...ki,kij,...kj->...k", diff, self.precisions, diff)
        return jnp.min(quad + self.consts, axis=-1)
