"""Driver-entry regression tests.

Round-1 failure mode: ``dryrun_multichip(8)`` raised "requested 8 devices,
have 1" in the driver environment because the entry never provisioned
virtual devices. These tests pin the provisioning logic and run the dryrun
exactly as the driver does (fresh interpreter, no XLA_FLAGS).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __graft_entry__ as graft_entry  # noqa: E402


def test_flags_with_device_count_appends():
    flags = graft_entry._flags_with_device_count("", 8)
    assert flags == "--xla_force_host_platform_device_count=8"


def test_flags_with_device_count_replaces_existing():
    flags = graft_entry._flags_with_device_count(
        "--foo=1 --xla_force_host_platform_device_count=1 --bar=2", 8
    )
    assert "--foo=1" in flags and "--bar=2" in flags
    assert flags.count("host_platform_device_count") == 1
    assert "device_count=8" in flags


def test_provision_reports_when_backend_already_up():
    # Under the test suite the CPU backend is already initialised with 8
    # virtual devices, so provisioning trivially succeeds in-process.
    assert graft_entry._provision_virtual_devices(8)
    assert not graft_entry._provision_virtual_devices(10_000)


@pytest.mark.slow
def test_dryrun_multichip_driver_invocation():
    """Run dryrun_multichip(8) in a fresh interpreter with no XLA_FLAGS —
    byte-for-byte the driver's invocation that failed in round 1."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    result = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=580,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "dryrun_multichip OK" in result.stdout
