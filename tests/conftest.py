"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (SURVEY.md environment notes)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# the environment's sitecustomize registers the axon TPU plugin and calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# clobbering the env var above -- force CPU back through the config API so
# tests never touch the (single, shared) TPU tunnel
import jax

jax.config.update("jax_platforms", "cpu")

import pytest

DATA = pathlib.Path("/root/reference/src/pyhmmer/tests/data")


def pytest_configure(config):
    config.addinivalue_line("markers", "golden: tests needing reference data")


@pytest.fixture(scope="session")
def data_dir():
    if not DATA.exists():
        pytest.skip("reference test data not available")
    return DATA
