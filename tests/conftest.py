"""Test configuration.

Tests run on CPU with a virtual 8-device platform so that multi-chip
sharding code paths (mesh/shard_map) are exercised without TPU hardware
(SURVEY.md §4).  The container preloads jax and registers a remote TPU
backend (JAX_PLATFORMS=axon) at interpreter startup, so merely setting
env vars is not enough — we also update the runtime config before any
backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert jax.device_count() == 8, "expected 8 virtual CPU devices"
