"""True device-side cost of the bench's compress/decompress path, timed by
looping INSIDE one jit (no per-dispatch tunnel overhead).

Measures, at bench shapes (8 MB blocks, vmap group 8, 64 MB total):
  A. compress_uniform alone
  B. decompress_uniform(compress_uniform(...)) + verify, fused
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dsrc_tpu.parallel import uniform_pipeline as UP
from dsrc_tpu.utils.synth import make_fastq_fast

K = int(os.environ.get("PROBE_K", "4"))
BLOCK_MB = 8
GROUP_B = 8
READ_LEN = 100


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    probe = make_fastq_fast(1, READ_LEN, fixed_width=True)
    spec = UP.detect_spec(probe)
    rpad = ((BLOCK_MB << 20) // spec.rec_bytes // UP.GROUP) * UP.GROUP
    data = np.frombuffer(
        make_fastq_fast(rpad * GROUP_B, READ_LEN, seed=1, fixed_width=True),
        np.uint8)
    mb = len(data) / (1 << 20)
    blocks = jax.device_put(data.reshape(GROUP_B, rpad, spec.rec_bytes))
    nr = jnp.int32(rpad)
    print(f"{mb:.0f} MB, rpad {rpad}", flush=True)

    def comp_loop(bl):
        def body(i, acc):
            b = bl ^ (i & 1).astype(jnp.uint8)
            c = jax.vmap(lambda x: UP.compress_uniform(x, nr, spec, rpad))(b)
            return acc + jnp.sum(c["comp_bytes"]) + c["qual"][0].sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    f = jax.jit(comp_loop)
    t0 = time.time(); int(f(blocks)); c1 = time.time() - t0
    t0 = time.time(); int(f(blocks)); dt = (time.time() - t0) / K
    print(f"A compress_uniform fused: {dt*1e3:7.1f} ms "
          f"({mb/dt:.0f} MB/s) [compile {c1:.0f}s]", flush=True)

    def rt_loop(bl):
        def body(i, acc):
            b = bl ^ (i & 1).astype(jnp.uint8)
            c = jax.vmap(lambda x: UP.compress_uniform(x, nr, spec, rpad))(b)
            o = jax.vmap(lambda x: UP.decompress_uniform(x, spec, rpad))(c)
            okv = jax.vmap(lambda a, bb: UP.mats_equal(a, bb, nr))(o, b)
            return acc + okv.astype(jnp.int32).sum() + jnp.sum(c["comp_bytes"])
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    g = jax.jit(rt_loop)
    t0 = time.time(); r = int(g(blocks)); c2 = time.time() - t0
    t0 = time.time(); r = int(g(blocks)); dt = (time.time() - t0) / K
    print(f"B roundtrip fused: {dt*1e3:7.1f} ms "
          f"(RT {2*mb/dt:.0f} MB/s) ok-sum={r & 0xff} [compile {c2:.0f}s]",
          flush=True)


if __name__ == "__main__":
    main()
