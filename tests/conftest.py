"""Test environment: force an 8-device virtual CPU topology.

All tests run on CPU so they are hardware-portable; multi-device sharding semantics
are exercised on a faked 8-device host platform (SURVEY.md §4 item 3). These env vars
must be set before the first jax import.
"""

import os

# FORCE cpu: the machine environment presets JAX_PLATFORMS=axon (the tunneled
# TPU), so a setdefault would silently run every test on the real chip through
# the remote compiler.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: repeat test runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# the machine's sitecustomize registers the axon TPU plugin and selects it
# regardless of the env var; force the selection back to cpu post-import
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(7)
