"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a host-platform device mesh
(SURVEY.md §4: fake a pod slice via XLA_FLAGS host device count), so the
suite runs identically with or without TPU hardware attached.
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the tunneled
# TPU ('axon'), but the suite needs the 8-device virtual host platform.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env vars)
import pytest  # noqa: E402

# A sitecustomize hook on this image registers the remote-TPU ('axon')
# PJRT plugin and force-updates jax_platforms to "axon,cpu", overriding
# the env var — re-pin to CPU before any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# The sitecustomize import also means jax read its env-var config BEFORE
# the os.environ writes above, so JAX_COMPILATION_CACHE_DIR never took:
# the suite ran every session with a cold persistent cache (the dominant
# wall-time cost on this 2-core box). Set the config values directly.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()
