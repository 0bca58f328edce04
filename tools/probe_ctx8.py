"""Why is CTX8 (order-5, 2^15 ctx, A=8) 4x slower than CTX4 (order-6,
2^12 ctx, A=4)?  Bisect num_ctx and nsym independently on the encode side."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from dsrc_tpu.ops import ctx as C

N = 1 << 23
L = 2048
edges = C.band_edges(-(-N // L))
rng = np.random.default_rng(0)
nn = jnp.int32(N)

def t_enc(order, sb, nsym):
    syms = jnp.asarray(rng.integers(0, min(nsym, 5), N).astype(np.int32))
    def loop(s, k):
        def body(i, acc):
            e = C.encode_orderk(s ^ (i & 1), nn, order, sb, nsym, L, edges)
            return acc + e["nwords"].sum() + e["states"].sum().astype(jnp.int32)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    f = jax.jit(loop)
    jax.block_until_ready(f(syms, jnp.int32(1)))
    t0=time.time(); jax.block_until_ready(f(syms, jnp.int32(1))); t1=time.time()-t0
    t0=time.time(); jax.block_until_ready(f(syms, jnp.int32(3))); tk=time.time()-t0
    dt = (tk-t1)/2 if tk > 1.3*t1 else tk/3
    print(f"enc order={order} sb={sb} A={nsym} C=2^{order*sb}: "
          f"{N/dt/1e6:7.1f} Msym/s", flush=True)

t_enc(6, 2, 4)    # C=4096  A=4  (fast baseline)
t_enc(5, 2, 4)    # C=1024  A=4
t_enc(4, 3, 8)    # C=4096  A=8  -> isolates nsym effect
t_enc(5, 3, 8)    # C=32768 A=8  -> the slow config
t_enc(6, 3, 8)    # C=262144 A=8
