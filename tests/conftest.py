"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX substitute for testing multi-chip sharding without a
real TPU pod: XLA exposes N host-CPU devices and pjit/shard_map compile and
execute real collectives over them.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(123456)
