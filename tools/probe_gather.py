"""Raw cost of per-element table lookups on TPU — the op that bounds both
generic wavefronts (1 lookup/symbol).  Times several formulations."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np

N = 1 << 23
C, A = 4096, 64
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, C * A, N).astype(np.int32))
ctx = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
tab = jnp.asarray(rng.integers(1, 1 << 14, (C, A)).astype(np.int32))
tabf = tab.reshape(-1)

def timeit(name, f, *args):
    g = jax.jit(f)
    r = g(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(3):
        r = g(*args)
    jax.block_until_ready(r); dt = (time.time() - t0) / 3
    print(f"{name:40s} {dt*1e3:8.2f} ms  {dt/N*1e9:6.2f} ns/idx", flush=True)

timeit("1D take flat [N] from [C*A]", lambda i: jnp.take(tabf, i, mode="clip").sum(), idx)
timeit("row take [N,A] rows from [C,A]", lambda c: jnp.take(tab, c, axis=0, mode="clip").sum(), ctx)
timeit("1D take [N] from tiny [4096]", lambda i: jnp.take(tabf[:4096], i & 4095, mode="clip").sum(), idx)
timeit("1D take [N] from tiny [256]", lambda i: jnp.take(tabf[:256], i & 255, mode="clip").sum(), idx)
# 2D shaped indices (keep [T, L] layout like the wavefront)
idx2 = idx.reshape(4096, 2048)
timeit("take [T,L] from [C*A]", lambda i: jnp.take(tabf, i, mode="clip").sum(), idx2)
# one-hot matmul over a SMALL table (C=256) as MXU alternative
small = tab[:256, :4].astype(jnp.float32)
ctx8 = ctx & 255
def onehot_mm(c):
    oh = (c[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
    return jnp.dot(oh.astype(jnp.bfloat16), small.astype(jnp.bfloat16)).sum()
timeit("one-hot matmul [N,256]@[256,4]", onehot_mm, ctx8)
