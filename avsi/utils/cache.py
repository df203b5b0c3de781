"""Persistent XLA compilation cache (opt-in helper).

The reference pays TF1 graph construction every process start; avsi pays
XLA compiles instead — slow on this sandbox (remote compile, 10-40 s per
program) and repeated identically across CLI invocations, bench runs and
study scripts.  The cache is keyed on HLO + compiler version, so stale
hits are not a correctness risk (same policy as tests/conftest.py).

Call `enable()` once per process, before the first jit executes.  No-op
on jax builds without the knobs or backends that cannot serialize
executables.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str | None:
    import jax

    cache_dir = cache_dir or os.environ.get("AVSI_JAX_CACHE", "/tmp/avsi_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
