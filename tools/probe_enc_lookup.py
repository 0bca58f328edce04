"""Encode-side table lookup formulations: flat gather vs row-take + chain
vs row-take + take_along_axis (the encode wavefront's dominant op)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np

N = 1 << 23
rng = np.random.default_rng(0)

def timeit(name, f, *args):
    g = jax.jit(f)
    r = g(*args); jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(3):
        r = g(*args)
    jax.block_until_ready(r); dt = (time.time() - t0) / 3
    print(f"{name:44s} {dt*1e3:8.2f} ms  {dt/N*1e9:6.2f} ns/sym", flush=True)

# quality-like: C=4096, A=64
C, A = 4096, 64
ctx = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
sym = jnp.asarray(rng.integers(0, A, N).astype(np.int32))
tab = jnp.asarray(rng.integers(1, 1 << 29, (C, A)).astype(np.int32))
timeit("qual flat gather [N] from [C*A]",
       lambda c, s: jnp.take(tab.reshape(-1), c * A + s, mode="clip").sum(),
       ctx, sym)
def rowchain(c, s):
    rows = jnp.take(tab, c, axis=0, mode="clip")        # [N, A]
    out = jnp.zeros_like(s)
    for a in range(A):
        out = jnp.where(s == a, rows[:, a], out)
    return out.sum()
timeit("qual row-take + select chain", rowchain, ctx, sym)
def rowtaa(c, s):
    rows = jnp.take(tab, c, axis=0, mode="clip")
    return jnp.take_along_axis(rows, s[:, None], axis=1).sum()
timeit("qual row-take + take_along_axis", rowtaa, ctx, sym)
def rowdot(c, s):
    rows = jnp.take(tab, c, axis=0, mode="clip")
    oh = (s[:, None] == jnp.arange(A, dtype=jnp.int32)[None, :])
    return jnp.sum(jnp.where(oh, rows, 0))
timeit("qual row-take + one-hot mask sum", rowdot, ctx, sym)

# dna-like: C=4096, A=4; rows packed 16 ctx x 4 syms = 64 wide
C2, A2 = 4096, 4
ctx2 = jnp.asarray(rng.integers(0, C2, N).astype(np.int32))
sym2 = jnp.asarray(rng.integers(0, A2, N).astype(np.int32))
tab2 = jnp.asarray(rng.integers(1, 1 << 29, (C2, A2)).astype(np.int32))
timeit("dna flat gather [N] from [C*A]",
       lambda c, s: jnp.take(tab2.reshape(-1), c * A2 + s,
                             mode="clip").sum(), ctx2, sym2)
tab2w = tab2.reshape(C2 // 16, 64)
def dnachain(c, s):
    rows = jnp.take(tab2w, c >> 4, axis=0, mode="clip")  # [N, 64]
    key = ((c & 15) << 2) | s
    out = jnp.zeros_like(s)
    for a in range(64):
        out = jnp.where(key == a, rows[:, a], out)
    return out.sum()
timeit("dna packed row-take + select chain", dnachain, ctx2, sym2)
def dnataa(c, s):
    rows = jnp.take(tab2w, c >> 4, axis=0, mode="clip")
    key = ((c & 15) << 2) | s
    return jnp.take_along_axis(rows, key[:, None], axis=1).sum()
timeit("dna packed row-take + take_along_axis", dnataa, ctx2, sym2)

def dnanarrow(c, s):
    rows = jnp.take(tab2, c, axis=0, mode="clip")        # [N, 4]
    oh = (s[:, None] == jnp.arange(A2, dtype=jnp.int32)[None, :])
    return jnp.sum(jnp.where(oh, rows, 0))
timeit("dna narrow row-take + one-hot mask sum", dnanarrow, ctx2, sym2)
def dnapackedoh(c, s):
    rows = jnp.take(tab2w, c >> 4, axis=0, mode="clip")  # [N, 64]
    key = ((c & 15) << 2) | s
    oh = (key[:, None] == jnp.arange(64, dtype=jnp.int32)[None, :])
    return jnp.sum(jnp.where(oh, rows, 0))
timeit("dna packed row-take + one-hot mask sum", dnapackedoh, ctx2, sym2)
# 2D-shaped indices ([T, L] like the wavefront)
T, L = N // 2048, 2048
ctxq2 = ctx.reshape(T, L); symq2 = sym.reshape(T, L)
def rowoh2d(c, s):
    rows = jnp.take(tab, c, axis=0, mode="clip")         # [T, L, A]
    oh = (s[:, :, None] == jnp.arange(A, dtype=jnp.int32)[None, None, :])
    return jnp.sum(jnp.where(oh, rows, 0))
timeit("qual [T,L] row-take + one-hot mask sum", rowoh2d, ctxq2, symq2)
