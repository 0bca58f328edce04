"""Steady-state throughput: K repeated dispatches of the bench's fused
compress / decompress+verify programs over the same staged 256 MB, one
host sync at the end.  Splits per-dispatch overhead from sustained chip
rate (bench.py's single-dispatch timing folds ~100+ ms of dispatch/sync
overhead into the 256 MB measurement).

Usage: python tools/probe_reps.py [K] [MB] [GROUP]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from dsrc_tpu.parallel import uniform_pipeline as UP
from dsrc_tpu.utils.synth import make_fastq_fast

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
MB = int(sys.argv[2]) if len(sys.argv) > 2 else 256
GROUP = int(sys.argv[3]) if len(sys.argv) > 3 else 32
READ_LEN = 100


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    probe = make_fastq_fast(1, READ_LEN, fixed_width=True)
    spec = UP.detect_spec(probe)
    rpad = ((8 << 20) // spec.rec_bytes // UP.GROUP) * UP.GROUP
    cap = rpad * spec.rec_bytes
    nb = max(GROUP, ((MB << 20) // cap) // GROUP * GROUP)
    t0 = time.time()
    data = np.frombuffer(make_fastq_fast(rpad * nb, READ_LEN, seed=1,
                                         fixed_width=True), np.uint8)
    print(f"gen {time.time()-t0:.0f}s, {len(data)/(1<<20):.0f} MB, "
          f"{nb} blocks, group {GROUP}", flush=True)
    blocks = jax.device_put(data.reshape(nb // GROUP, GROUP, rpad,
                                         spec.rec_bytes))
    _ = int(jnp.sum(blocks[0, 0, 0, :].astype(jnp.int32)))
    nr = jnp.int32(rpad)

    @jax.jit
    def vcomp(b):
        c = jax.vmap(lambda x: UP.compress_uniform(x, nr, spec, rpad))(b)
        return c, jnp.sum(c["comp_bytes"])

    @jax.jit
    def vdec_ok(c, b):
        o = jax.vmap(lambda x: UP.decompress_uniform(x, spec, rpad))(c)
        return jax.vmap(lambda x, y: UP.mats_equal(x, y, nr))(o, b).all()

    t0 = time.time()
    cshape, _ = jax.eval_shape(vcomp, blocks[0])
    vcomp = vcomp.lower(blocks[0]).compile()
    vdec_ok = vdec_ok.lower(cshape, blocks[0]).compile()
    comp0, sz = vcomp(blocks[0])
    ok0 = bool(vdec_ok(comp0, blocks[0]))
    print(f"warm {time.time()-t0:.0f}s ok={ok0}", flush=True)

    size_mb = len(data) / (1 << 20)
    ng = nb // GROUP
    for reps in (1, K):
        t0 = time.time()
        szs = []
        comps = []
        for r in range(reps):
            for g in range(ng):
                c, s = vcomp(blocks[g])
                szs.append(s)
                if r == 0:
                    comps.append(c)
        tot = sum(int(s) for s in szs)
        comp_s = time.time() - t0
        t0 = time.time()
        oks = []
        for r in range(reps):
            for g in range(ng):
                oks.append(vdec_ok(comps[g], blocks[g]))
        ok = all(bool(o) for o in oks)
        dec_s = time.time() - t0
        n = reps * size_mb
        print(f"reps={reps}: comp {n/comp_s:7.1f} MB/s ({comp_s*1e3:.0f} ms)"
              f"  dec {n/dec_s:7.1f} MB/s ({dec_s*1e3:.0f} ms)  ok={ok}"
              f"  rt {2*n/(comp_s+dec_s):7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
