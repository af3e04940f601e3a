"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding logic is exercised without TPU hardware (the TPU-world
answer to testing distributed code without a cluster).

Note: this environment's TPU plugin overrides JAX_PLATFORMS via jax.config at
interpreter start, so we must override back through jax.config — env vars
alone are not enough.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
