"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised the JAX-native way
(xla_force_host_platform_device_count) — no real TPU pod needed.

The axon TPU plugin registers its backend from sitecustomize.py at
interpreter startup and forces ``jax_platforms="axon,cpu"`` through
jax.config (so the JAX_PLATFORMS env var alone is ignored). We override
the config back to pure CPU and clear any initialized backends; XLA_FLAGS
must be set before the fresh CPU client is created. A persistent
compilation cache amortizes XLA:CPU compile time across pytest runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()

jax.config.update("jax_compilation_cache_dir", "/tmp/mdtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
