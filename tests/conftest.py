"""Test harness: run everything on a fake 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (the reference had no tests at all for its
main repo; this follows the oracle + device-fixture pattern of its vendored
torchsearchsorted tests, /root/reference/torchsearchsorted/test/conftest.py:4-11).

NOTE: the axon TPU plugin in this image ignores JAX_PLATFORMS, so we force the
platform through jax.config, which wins.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on cpu, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
