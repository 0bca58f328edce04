"""Multi-device scaling of the sharded block codec (BASELINE.md table).

Times MeshUniformCodec's jitted compress program (the same one
DsrcModule uses when >1 device is visible) at D = 1, 2, 4, ... devices
on whatever mesh is available — the driver/test environment provides a
virtual 8-device CPU mesh via --xla_force_host_platform_device_count=8.
Each device gets one block; the cross-device traffic is only the size
cumsum collective, so scaling should be near-linear until the host's
physical cores saturate (virtual CPU devices share the machine).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_mesh_scaling.py [records_per_block]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# The axon site plugin (sitecustomize) may have forced jax_platforms at
# interpreter startup regardless of JAX_PLATFORMS; config beats env, and the
# override must land BEFORE any backend initialization (conftest.py does the
# same).  This benchmark is about mesh *scaling*, so always use the virtual
# CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dsrc_tpu.models.block import _rpad_bucket  # noqa: E402
from dsrc_tpu.parallel import uniform_pipeline as UP  # noqa: E402
from dsrc_tpu.parallel.mesh import BLOCK_AXIS, MeshUniformCodec  # noqa: E402
from dsrc_tpu.utils.synth import make_fastq_fast  # noqa: E402


def main() -> None:
    records = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    read_len = 100
    probe = make_fastq_fast(1, read_len, fixed_width=True)
    spec = UP.detect_spec(probe)
    assert spec is not None
    rpad = _rpad_bucket(records)
    block_mb = rpad * spec.rec_bytes / (1 << 20)
    reps = max(2, int(8 / block_mb))

    devs = jax.devices()
    print(f"platform={devs[0].platform} devices={len(devs)} "
          f"block={block_mb:.2f} MB (rpad={rpad}) reps={reps}")
    sizes = [d for d in (1, 2, 4, 8, 16) if d <= len(devs)]
    base = None
    rows = []
    for d in sizes:
        mesh = Mesh(np.array(devs[:d]), (BLOCK_AXIS,))
        codec = MeshUniformCodec(mesh, spec, rpad)
        mats = np.zeros((d, rpad, spec.rec_bytes), np.uint8)
        for i in range(d):
            data = make_fastq_fast(rpad, read_len, seed=i, fixed_width=True)
            mats[i] = np.frombuffer(data, np.uint8).reshape(
                rpad, spec.rec_bytes)
        nr = [rpad] * d
        # warm (compiles for this D)
        res, off = codec.compress_blocks(mats, nr)
        assert all(r is not None for r in res)
        # time the SHARDED DEVICE STEP only (the part that maps to chips);
        # host serialization is per-host work a production feeder threads
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        import jax.numpy as jnp
        mats_s = _jax.device_put(mats, codec._bsh)
        nr_s = _jax.device_put(np.asarray(nr, np.int32), codec._vsh)
        _jax.block_until_ready(codec._comp(mats_s, nr_s))
        t0 = time.time()
        for _ in range(reps):
            out = codec._comp(mats_s, nr_s)
        _jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        mbps = d * block_mb / dt
        if base is None:
            base = mbps
        rows.append((d, mbps, mbps / base, mbps / base / d))
        print(f"D={d:2d}  {mbps:8.1f} MB/s  speedup {mbps / base:5.2f}x  "
              f"efficiency {mbps / base / d * 100:5.1f}%")
    print("| devices | MB/s | speedup | efficiency |")
    print("|---|---|---|---|")
    for d, mbps, sp, eff in rows:
        print(f"| {d} | {mbps:.1f} | {sp:.2f}x | {eff * 100:.0f}% |")


if __name__ == "__main__":
    main()
