"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX substitute for testing multi-chip sharding without a
real TPU pod: XLA exposes N host-CPU devices and pjit/shard_map compile and
execute real collectives over them.
"""
import os

# Force the CPU backend even when the environment pins JAX_PLATFORMS=axon
# (the TPU relay): tests must run hermetically on a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on CPU devices"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.RandomState(123456)
