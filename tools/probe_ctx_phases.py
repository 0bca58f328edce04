"""Phase costs of the order-5 CTX8 dna codec (2^15 contexts x 8 syms)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from dsrc_tpu.ops import ctx as C
from dsrc_tpu.ops.rans import quantize_counts, cum_from_freqs

N = 1 << 23
CTX, A = 1 << 15, 8
NB = CTX * A
rng = np.random.default_rng(0)
flat = jnp.asarray(rng.integers(0, NB, N).astype(np.int32))
ctxi = jnp.asarray(rng.integers(0, CTX, N).astype(np.int32))
sym = jnp.asarray(rng.integers(0, A, N).astype(np.int32))
act = jnp.ones((N,), bool)
hist = jnp.asarray(rng.integers(0, 50, NB).astype(np.int32))

def timeit(name, f, *args):
    g = jax.jit(f)
    r = g(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(3):
        r = g(*args)
    jax.block_until_ready(r)
    print(f"{name:42s} {(time.time()-t0)/3*1e3:8.2f} ms", flush=True)

timeit("hist_update 8M -> 256K bins", lambda f, a: C.hist_update(f, a, NB).sum(), flat, act)
timeit("quantize_counts [32768, 8] x9", lambda h: sum(quantize_counts((h + i).reshape(CTX, A)).sum() for i in range(9)), hist)
tab = jnp.asarray(rng.integers(1, 1 << 14, (CTX, A)).astype(np.int32))
def rowtake(c, s):
    rows = jnp.take(tab, c, axis=0, mode="clip")
    return jnp.where(s[:, None] == jnp.arange(A, dtype=jnp.int32)[None, :], rows, 0).sum()
timeit("row-take+mask 8M from [32768, 8]", rowtake, ctxi, sym)
timeit("scatter-add 8M -> 256K bins", lambda f, a: jnp.zeros((NB,), jnp.int32).at[jnp.where(a, f, NB)].add(1, mode="drop").sum(), flat, act)
