"""Persistent XLA compile cache for production entry points.

The incremental mapper's bucketed kernels cost ~110 s of jit compiles per
fresh process at 100 images (the cold/warm gap on the mapper bench axis),
and every per-cluster lease worker (parallel/distributed.py) is a fresh
process — so production pays the tax once per worker per run. The
persistent compilation cache removes it: compiled executables are keyed
by HLO hash and reloaded across processes (measured on the remote-TPU
tunnel: 1.8 s -> 0.3 s for a first-touch jit in a fresh interpreter).

Deliberately NOT enabled for the CPU test suite: XLA:CPU AOT executables
on this class of machine embed host CPU features that may not reload
("Compile machine features ... vs host machine features" SIGILL warnings)
and same-run cache round-trips have crashed the suite — see
tests/conftest.py. The cache is therefore gated on a non-CPU backend.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "dagsfm_tpu", "xla")


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 0.0) -> str | None:
    """Enable the JAX persistent compilation cache for device backends.

    Returns the cache directory, or None when skipped (CPU backend).
    Call once at process start (CLI main, bench main, lease workers).
    Override the location with $DAGSFM_COMPILE_CACHE or `path`;
    $DAGSFM_COMPILE_CACHE=off disables entirely.
    """
    import jax

    env = os.environ.get("DAGSFM_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return None
    if jax.default_backend() == "cpu":
        return None
    cache_dir = path or env or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
