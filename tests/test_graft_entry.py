"""Regression tests for the driver entry points (__graft_entry__.py).

Round-1 failure mode (MULTICHIP_r01.json ok:false): dryrun_multichip relied on
jax.config.update("jax_platforms", "cpu"), which is a silent no-op once the
backend is initialized — the driver touches jax.devices() first, so the dry
run saw the 1-chip axon platform and asserted. The fix re-execs the dry-run
body in a subprocess whose env forces a virtual CPU mesh. These tests
initialize the backend FIRST and then require the dry run to pass anyway.
"""
import sys

import jax
import pytest

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))

import __graft_entry__ as ge  # noqa: E402


def test_child_env_forces_cpu_and_device_count(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv(
        "XLA_FLAGS", "--foo=1 --xla_force_host_platform_device_count=8")
    env = ge._child_env(16)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=16" in env["XLA_FLAGS"]
    assert "device_count=8" not in env["XLA_FLAGS"]
    assert "--foo=1" in env["XLA_FLAGS"]


def test_dryrun_inprocess_after_backend_init():
    # Backend is already up (conftest pinned 8 CPU devices); 8 <= 8 so this
    # runs in-process — the common driver-on-CI path.
    assert len(jax.devices()) == 8
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_reexecs_when_backend_too_small(capsys):
    # The round-1 failure: backend initialized with FEWER devices than asked.
    # 16 > 8 forces the subprocess fallback, which must succeed with a
    # 16-device virtual CPU mesh.
    assert len(jax.devices()) == 8  # backend pinned before the call
    ge.dryrun_multichip(16)
    out = capsys.readouterr().out
    assert "dryrun child ok" in out
