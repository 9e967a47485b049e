"""Test configuration: force the CPU backend with 8 virtual devices.

This is the standard JAX fake-backend setup for testing pjit/shard_map
multi-chip code without real TPU hardware (SURVEY.md §4).

NOTE: this environment's sitecustomize imports jax at interpreter start to
register the TPU ("axon") PJRT plugin, so setting JAX_PLATFORMS in conftest
is too late as an env var. `jax.config.update` still works because backends
are initialized lazily — but it must run before any jax computation.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", (
    f"tests must run on the CPU backend, got {jax.devices()}"
)
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
