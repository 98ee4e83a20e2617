"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a host-platform device mesh
(SURVEY.md §4: fake a pod slice via XLA_FLAGS host device count), so the
suite runs identically with or without TPU hardware attached.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env vars)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()
