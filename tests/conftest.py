"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

This is the TPU-world equivalent of a fake multi-device backend — sharding
and collective behavior is validated here exactly as it will compile on a
real slice (SURVEY.md §4).

NOTE: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
env var, so the platform must be pinned via jax.config.update BEFORE the
backend initializes. A persistent compilation cache keeps repeat runs fast
on the single-core host.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
