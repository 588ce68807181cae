"""Test harness: run everything on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/pjit paths are
validated on XLA's host-platform device simulation (SURVEY §4d)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize force-registers the axon TPU plugin and the env
# pins JAX_PLATFORMS=axon; the config override below (not just the env var)
# is what actually restores the CPU simulation.  Set PINNFC_TEST_TPU=1 to run
# the suite against the real chip instead (used to validate Pallas kernels
# on hardware).
import jax  # noqa: E402

if os.environ.get("PINNFC_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_dataset():
    """Small combined dataset for fast end-to-end tests."""
    from pinnfc_tpu.data import combine_and_normalize, synthesize_stack_data

    normal, faults = synthesize_stack_data(n_normal=600, n_fault=80, seed=0)
    return combine_and_normalize(normal, faults, training_rate=1.0, seed=42)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
