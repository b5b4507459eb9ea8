"""Test configuration: float64 precision and a virtual 8-device CPU mesh.

The container's sitecustomize registers a remote-TPU ("axon") backend and
pre-imports jax with JAX_PLATFORMS=axon, so plain env vars are too late here;
we switch the already-imported jax to CPU via jax.config instead.  Sharding
tests get 8 virtual CPU devices via the XLA flag (must be set before the CPU
backend is first initialized, which jax does lazily -- conftest runs early
enough).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")
    config.addinivalue_line(
        "markers", "heavy: compile-heavy test (sharding / iterative / "
        "inference); deselect with -m 'not heavy' for a fast inner loop")
