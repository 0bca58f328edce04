"""On-chip throughput of the generic band-adaptive order-k codec
(ops/ctx.py) at -d2/-q2-like shapes, timed with in-jit loops (genuine
data dependence per rep).  Usage: python tools/probe_ctx.py [K]"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dsrc_tpu.ops import ctx as C

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def bench_one(name, n, order, sym_bits, nsym, num_lanes, seed):
    rng = np.random.default_rng(seed)
    syms = jnp.asarray(rng.integers(0, nsym, n).astype(np.int32))
    edges = C.band_edges(-(-n // num_lanes))
    nn = jnp.int32(n)

    def enc_loop(s):
        def body(i, acc):
            e = C.encode_orderk(s ^ (i & 1), nn, order, sym_bits, nsym,
                                num_lanes, edges)
            return acc + e["nwords"].sum() + e["payload"][0, 0] \
                + e["states"].sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    f = jax.jit(enc_loop)
    t0 = time.time(); int(f(syms)); c1 = time.time() - t0
    t0 = time.time(); int(f(syms)); enc_dt = (time.time() - t0) / K

    enc = C.encode_orderk(syms, nn, order, sym_bits, nsym, num_lanes, edges)
    t_steps = -(-n // num_lanes)
    pay, st = enc["payload"], enc["states"]

    def dec_loop(p, s):
        def body(i, acc):
            out = C.decode_orderk(jnp.roll(p, i, axis=0),
                                  jnp.roll(s, i, axis=0), nn, t_steps,
                                  order, sym_bits, nsym, num_lanes, edges,
                                  nwords=jnp.roll(enc["nwords"], i, axis=0))
            return acc + out.sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    g = jax.jit(dec_loop)
    t0 = time.time(); int(g(pay, st)); c2 = time.time() - t0
    t0 = time.time(); int(g(pay, st)); dec_dt = (time.time() - t0) / K
    print(f"{name:28s} enc {n/enc_dt/1e6:7.1f} Msym/s "
          f"dec {n/dec_dt/1e6:7.1f} Msym/s "
          f"[compile {c1:.0f}+{c2:.0f}s]", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    n = 1 << 23                        # ~8M symbols (one 8 MB DNA stream)
    import os
    lanes = [int(x) for x in os.environ.get("CTX_LANES", "2048").split(",")]
    for ll in lanes:
        bench_one(f"dna order-6 A=4 L={ll}", n, 6, 2, 4, ll, 0)
        bench_one(f"qual order-2 A=64 L={ll}", n, 2, 6, 64, ll, 1)


if __name__ == "__main__":
    main()
