"""encode/decode_orderk across (order, sym_bits, nsym) configs."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from dsrc_tpu.ops import ctx as C

N = 1 << 23
L = 2048
edges = C.band_edges(-(-N // L))
T = -(-N // L)
rng = np.random.default_rng(0)
nn = jnp.int32(N)

for (order, sb, nsym) in [(6,2,4), (5,3,8), (4,3,8), (3,3,8), (5,3,8)]:
    syms = jnp.asarray(rng.integers(0, min(nsym,5), N).astype(np.int32))
    def enc_loop(s, k, order=order, sb=sb, nsym=nsym):
        def body(i, acc):
            e = C.encode_orderk(s ^ (i & 1), nn, order, sb, nsym, L, edges)
            return acc + e["nwords"].sum() + e["states"].sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    f = jax.jit(enc_loop)
    jax.block_until_ready(f(syms, jnp.int32(1)))
    t0=time.time(); jax.block_until_ready(f(syms, jnp.int32(1))); t1=time.time()-t0
    t0=time.time(); jax.block_until_ready(f(syms, jnp.int32(4))); tk=time.time()-t0
    dt = (tk-t1)/3 if tk > 1.3*t1 else tk/4
    enc = C.encode_orderk(syms, nn, order, sb, nsym, L, edges)
    def dec_loop(p, s, k, order=order, sb=sb, nsym=nsym, nw=enc["nwords"]):
        def body(i, acc):
            out = C.decode_orderk(jnp.roll(p,i,0), jnp.roll(s,i,0), nn, T,
                                  order, sb, nsym, L, edges,
                                  nwords=jnp.roll(nw,i,0))
            return acc + out.sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    g = jax.jit(dec_loop)
    jax.block_until_ready(g(enc["payload"], enc["states"], jnp.int32(1)))
    t0=time.time(); jax.block_until_ready(g(enc["payload"], enc["states"], jnp.int32(1))); d1=time.time()-t0
    t0=time.time(); jax.block_until_ready(g(enc["payload"], enc["states"], jnp.int32(4))); dk=time.time()-t0
    ddt = (dk-d1)/3 if dk > 1.3*d1 else dk/4
    print(f"order={order} sb={sb} A={nsym}: enc {N/dt/1e6:7.1f} dec {N/ddt/1e6:7.1f} Msym/s", flush=True)
