"""Test config: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's compile
checks; unit tests must be hermetic and able to test multi-chip sharding
without hardware, so we force the CPU platform with 8 virtual devices.
"""

import os
import pathlib

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

if os.environ.get("CMS_TEST_ON_TPU") != "1":
    # NB: the axon TPU plugin overrides the JAX_PLATFORMS env var, so the
    # config API is the only reliable way to pin tests to CPU.
    import jax
    jax.config.update("jax_platforms", "cpu")

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures" / "cdsearch"


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES
