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

# NO persistent compile cache: on this machine XLA:CPU emits AOT
# executables targeting CPU features the host cannot reload (every
# cache read logs "Compile machine features ... vs host machine
# features ... could lead to execution errors such as SIGILL"), and
# SAME-RUN cache round-trips have segfaulted the suite inside
# jax compilation_cache.get_executable_and_time. Recompiling per run is
# slower but deterministic.


def _host_cache_dir() -> str:
    """Kept for the subprocess test helpers: returns a per-host scratch
    dir name, but the cache itself stays disabled (see note above)."""
    return "/tmp/jax_cache_disabled"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop every compiled XLA executable between test modules.

    Without this, a single pytest process accumulates the jitted programs
    of ~40 modules; on small 2-CPU boxes XLA:CPU's compile path has
    reproducibly aborted/segfaulted (inside backend_compile_and_load)
    after ~150 tests' worth of accumulation, killing the suite mid-run.
    Per-module cache clearing bounds the live-executable count at the
    cost of some recompilation, and combined with xdist loadfile
    distribution (see pytest.ini) keeps the default tier finishable.
    """
    yield
    jax.clear_caches()
