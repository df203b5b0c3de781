"""Test harness: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes (no TPU access in CI; the
multi-device tests exercise the same `jax.sharding.Mesh` code paths the TPU
slice uses).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env forces 'axon' (TPU); tests use CPU mesh
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("JAX_ENABLE_X64", "0")

# sitecustomize (axon) may import jax before this conftest runs, so the env
# var alone is not enough — force the platform through the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA:CPU compiles dominate suite wall time
# (the first full run pays them; re-runs hit the cache and drop from ~14 to
# a few minutes). Keyed on HLO + compiler version, so stale hits are not a
# correctness risk.
_cache_dir = os.environ.get("AVSI_JAX_CACHE", "/tmp/avsi_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs: run uncached
    pass
