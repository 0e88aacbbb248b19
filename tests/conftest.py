"""Test harness config: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# skip the genesis drop-settle jit on env.reset() in tests (expensive on the
# CPU platform); the pool path itself is covered by test_objects_sdf.py
os.environ.setdefault("HANDARM_DISABLE_GENESIS", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# the baked axon sitecustomize forces JAX_PLATFORMS=axon (remote TPU tunnel)
# and imports jax before env vars apply; tests must run on the virtual
# multi-device CPU platform with the persistent compile cache active
jax.config.update("jax_platforms", "cpu")

from handarm_tpu.utils.jaxinit import setup_cache  # noqa: E402

setup_cache()
