"""Split the decompress_uniform cost by stage (title / qual / dna / verify),
timed with in-jit fori_loops at bench shapes (8 MB blocks, vmap group 8).

CAVEAT: the per-stage loops perturb inputs with `x + (i - i)`, which XLA
can constant-fold and HOIST — per-stage numbers can read faster than
reality.  The `full decompress+verify` row and tools/probe_fused.py use
genuine data dependence and are trustworthy; treat the stage rows as
upper bounds only.

Usage: python tools/probe_dec_stages.py [K]
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

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
BLOCK_MB = 8
GROUP_B = 8
READ_LEN = 100


def timeit(name, f, *args):
    g = jax.jit(f)
    t0 = time.time(); int(g(*args)); c = time.time() - t0
    t0 = time.time(); int(g(*args)); dt = (time.time() - t0) / K
    print(f"{name:28s} {dt*1e3:7.1f} ms  [compile {c:.0f}s]", flush=True)
    return dt


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
    print(f"{mb:.0f} MB, rpad {rpad}, title_len {spec.title_len}", flush=True)

    comp = jax.jit(jax.vmap(
        lambda x: UP.compress_uniform(x, nr, spec, rpad)))(blocks)
    comp = jax.tree.map(lambda x: x.block_until_ready(), comp)

    def title_loop(c):
        tp, tn, ts, tt = c["title"]
        def body(i, acc):
            out = jax.vmap(lambda a, b, cc, d: UP.decode_positional(
                a, b, cc, d, nr, spec.title_len, rpad, UP.TITLE_A,
                UP.GROUP, delta=True))(tp + (i - i), ts, tn, tt)
            return acc + out.sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    def qual_loop(c):
        qp, qn, qs, qt = c["qual"]
        def body(i, acc):
            out = jax.vmap(lambda a, b, cc, d: UP.decode_positional(
                a, b, cc, d, nr, spec.read_len, rpad, UP.QUAL_A,
                UP.GROUP))(qp + (i - i), qs, qn, qt)
            return acc + out.sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    def dna_loop(c):
        packed, exc_bits, exc_count = c["dna"]
        def body(i, acc):
            out = jax.vmap(lambda a, b: UP.unpack_dna(
                a, b, exc_count[0], rpad, spec.read_len))(
                    packed + (i - i).astype(jnp.uint8), exc_bits)
            return acc + out.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    def full_loop(c, bl):
        def body(i, acc):
            o = jax.vmap(lambda x: UP.decompress_uniform(x, spec, rpad))(
                jax.tree.map(lambda v: v + (i - i).astype(v.dtype), c))
            okv = jax.vmap(lambda a, b: UP.mats_equal(a, b, nr))(o, bl)
            return acc + okv.astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    t = timeit("title decode (A=128,delta)", title_loop, comp)
    q = timeit("qual decode (A=64)", qual_loop, comp)
    d = timeit("dna unpack", dna_loop, comp)
    f = timeit("full decompress+verify", full_loop, comp, blocks)
    print(f"title {t*1e3:.1f} + qual {q*1e3:.1f} + dna {d*1e3:.1f} = "
          f"{(t+q+d)*1e3:.1f} vs full {f*1e3:.1f} ms "
          f"(full = {2*mb/f:.0f} MB/s RT-equiv side)", flush=True)


if __name__ == "__main__":
    main()
