"""Would DNA pair-coding pay?  encode/decode_orderk at pair shapes:
ACGT pairs (A=16, ctx = 3 prev pairs = 6 bases) and 8-sym pairs (A=64,
ctx = 2 prev pairs >= order-4-base).  Rates printed per BASE (2x syms)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from dsrc_tpu.ops import ctx as C

NB = 1 << 22                 # bases per block
L = 2048
rng = np.random.default_rng(0)

def run(label, npairs, order, sb, nsym):
    edges = C.band_edges(-(-npairs // L))
    T = -(-npairs // L)
    syms = jnp.asarray(rng.integers(0, nsym, npairs).astype(np.int32))
    nn = jnp.int32(npairs)
    def enc_loop(s, k):
        def body(i, acc):
            e = C.encode_orderk(s ^ (i & 1), nn, order, sb, nsym, L, edges)
            return acc + e["nwords"].sum() + e["states"].sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    f = jax.jit(enc_loop)
    jax.block_until_ready(f(syms, jnp.int32(1)))
    t0=time.time(); jax.block_until_ready(f(syms, jnp.int32(1))); t1=time.time()-t0
    t0=time.time(); jax.block_until_ready(f(syms, jnp.int32(3))); tk=time.time()-t0
    dt = (tk-t1)/2 if tk > 1.3*t1 else tk/3
    enc = C.encode_orderk(syms, nn, order, sb, nsym, L, edges)
    def dec_loop(p, s, k, nw=enc["nwords"]):
        def body(i, acc):
            out = C.decode_orderk(jnp.roll(p,i,0), jnp.roll(s,i,0), nn, T,
                                  order, sb, nsym, L, edges,
                                  nwords=jnp.roll(nw,i,0))
            return acc + out.sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    g = jax.jit(dec_loop)
    jax.block_until_ready(g(enc["payload"], enc["states"], jnp.int32(1)))
    t0=time.time(); jax.block_until_ready(g(enc["payload"], enc["states"], jnp.int32(1))); d1=time.time()-t0
    t0=time.time(); jax.block_until_ready(g(enc["payload"], enc["states"], jnp.int32(3))); dk=time.time()-t0
    ddt = (dk-d1)/2 if dk > 1.3*d1 else dk/3
    print(f"{label:34s} enc {NB/dt/1e6:7.1f} dec {NB/ddt/1e6:7.1f} Mbase/s",
          flush=True)

run("base CTX4 order-6 (A=4, C=2^12)", NB, 6, 2, 4)
run("pair A=16 ctx 3 pairs (C=2^12)", NB // 2, 3, 4, 16)
run("base CTX8 order-5 (A=8, C=2^15)", NB, 5, 3, 8)
run("pair A=64 ctx 2 pairs (C=2^12)", NB // 2, 2, 6, 64)
