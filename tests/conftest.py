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
