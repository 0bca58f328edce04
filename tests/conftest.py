"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (no pod available); the driver's
dryrun does the same.  A persistent compilation cache keeps repeated test
runs fast on this single-core host.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
