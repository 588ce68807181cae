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

# CLI-driving tests call cli.main(), which enables the persistent
# compilation cache process-wide.  On the CPU sim, DISABLE it (empty
# override): XLA:CPU executable serialize/deserialize aborted the whole
# pytest process twice late in full-suite runs (stacks in jax's
# put/get_executable_and_time), CPU compiles cost seconds anyway, and a
# test run killed mid-write can leave a truncated entry that aborts the
# next reader of the shared production cache (~/.cache/pinnfc_jax).
# The real-chip suite (PINNFC_TEST_TPU=1) keeps the shared cache on
# purpose: relay recompiles cost minutes per program.
if (os.environ.get("PINNFC_TEST_TPU") != "1"
        and "PINNFC_COMPILATION_CACHE_DIR" not in os.environ):
    os.environ["PINNFC_COMPILATION_CACHE_DIR"] = ""

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_state_per_module():
    """Free compiled executables and run destructors at module boundaries.

    A single pytest process accumulates hundreds of compiled XLA:CPU
    executables across the 300-test suite; late full-suite runs crashed
    native-side (SIGSEGV/SIGABRT inside ``backend_compile_and_load`` /
    executable serialize) while compiling yet another program at ~78%,
    though the same test passes standalone and in any 2-module subset.
    Clearing jax's caches and collecting garbage between modules keeps
    the native heap bounded and runs executable destructors at quiet
    points instead of mid-compile.  Skipped on the real chip: the crash
    is XLA:CPU-specific, and discarding the in-memory executable cache
    there would re-pay relay compiles (eager ops are not even in the
    persistent cache — CLAUDE.md)."""
    yield
    if os.environ.get("PINNFC_TEST_TPU") == "1":
        return
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def tiny_dataset():
    """Small combined dataset for fast end-to-end tests."""
    from pinnfc_tpu.data import combine_and_normalize, synthesize_stack_data

    normal, faults = synthesize_stack_data(n_normal=600, n_fault=80, seed=0)
    return combine_and_normalize(normal, faults, training_rate=1.0, seed=42)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
