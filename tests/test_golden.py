"""Golden-value regression tests for the core render math.

tests/golden_core_math.npz was frozen from the oracle-verified round-1
implementations (every op cross-checked against numpy/torch/scipy first).
These catch accidental semantic drift in future rounds without re-deriving
oracles. Regenerate ONLY when a semantics change is intentional and
re-verified against the reference formulas.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from smpl_nerf_tpu.core import encoding, integrate, rays, sampling

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden_core_math.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(_GOLDEN)


def test_golden_rays(golden):
    o, d = rays.get_rays(4, 5, 3.0, golden["rays_pose"])
    np.testing.assert_allclose(np.asarray(o), golden["rays_origins"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), golden["rays_dirs"], atol=1e-6)


def test_golden_encoding(golden):
    out = encoding.PositionalEncoder(4, True).encode(jnp.asarray(golden["enc_in"]))
    np.testing.assert_allclose(np.asarray(out), golden["enc_out"], atol=1e-6)


def test_golden_integration(golden):
    out = integrate.raw2outputs(jnp.asarray(golden["int_raw"]),
                                jnp.asarray(golden["int_z"]),
                                jnp.asarray(golden["int_dirs"]),
                                white_background=True)
    np.testing.assert_allclose(np.asarray(out.rgb), golden["int_rgb"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.weights), golden["int_weights"],
                               atol=1e-6)


def test_golden_sample_pdf(golden):
    out = sampling.sample_pdf(jnp.asarray(golden["pdf_bins"]),
                              jnp.asarray(golden["pdf_w"]), 16)
    np.testing.assert_allclose(np.asarray(out), golden["pdf_out"], atol=1e-6)
