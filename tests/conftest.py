"""Test configuration: run on a virtual 8-device CPU mesh with x64 support.

Environment variables must be set before JAX initializes its backends, so
this module sets them at import time (pytest imports conftest before test
modules import jax).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS in os.environ; the config flag below wins over
# both, pinning tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NOTE: do NOT enable the persistent compilation cache here. This jax's
# XLA:CPU AOT deserialization is not roundtrip-safe (machine-feature
# mismatch on reload -> SIGSEGV in compilation_cache.get_executable_and
# _time); the cache is TPU-only (bench.py and scripts/ set it).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    """Deterministic numpy RNG per test."""
    return np.random.default_rng(20260816)
