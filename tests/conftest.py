"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

This is the TPU-world equivalent of a fake multi-device backend — sharding
and collective behavior is validated here exactly as it will compile on a
real slice (SURVEY.md §4).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests
# must override it, not setdefault around it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
