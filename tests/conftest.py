"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on virtual CPU devices (the real
environment has a single TPU chip); bench.py is what targets real TPU.

Note: this environment pre-registers a TPU backend at interpreter start
(sitecustomize) with JAX_PLATFORMS already set, so we must override the
platform via jax.config — not os.environ — before any backend is touched.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache keeps repeat test runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests")
