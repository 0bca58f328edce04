"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (no pod available); the driver's
dryrun does the same.  A persistent compilation cache keeps repeated test
runs fast on this single-core host.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: tests shard on a virtual mesh
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "dsrc_tpu", "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
# Small decode super-chunk: the production cadence (8) unrolls 64 substeps
# per scan body, which the CPU XLA backend compiles very slowly; 2 keeps
# the suite fast.  Cadence does not affect the wire format or results —
# the TPU bench runs the production value.
os.environ.setdefault("DSRC_TPU_SUPER", "2")

# The full suite loads hundreds of XLA CPU executables in one process; each
# mmaps many regions and the kernel default vm.max_map_count=65530 overflows
# late in the run (LLVM then segfaults inside backend_compile_and_load).
# Best-effort raise (works when running as root; harmless otherwise); the
# original value is restored when the test session ends so the host-wide
# sysctl change does not outlive the run.  Opt out: DSRC_TPU_NO_SYSCTL=1.
_orig_map_count = None
if not os.environ.get("DSRC_TPU_NO_SYSCTL"):
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            _orig_map_count = int(f.read())
        if _orig_map_count < 500_000:
            with open("/proc/sys/vm/max_map_count", "w") as g:
                g.write("2000000")
        else:
            _orig_map_count = None
    except OSError:
        _orig_map_count = None


def pytest_sessionfinish(session, exitstatus):
    if _orig_map_count is not None:
        try:
            with open("/proc/sys/vm/max_map_count", "w") as g:
                g.write(str(_orig_map_count))
        except OSError:
            pass

# The axon TPU plugin (sitecustomize) may have already forced
# jax_platforms="axon,cpu" at interpreter startup; config beats env, so
# override it back — tests always run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
