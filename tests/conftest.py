"""Test config: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's compile
checks; unit tests must be hermetic and able to test multi-chip sharding
without hardware, so we force the CPU platform with 8 virtual devices.
"""

import os
import pathlib

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "cdsearch"


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES
