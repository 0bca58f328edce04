"""Micro-probe: cost of the per-chunk window-pair extraction in three
layouts, to decide the wavefront array orientation.

  a) dense per-bin masked sums over [L, 128]   (round-3 shipped form)
  b) binary-mux cone over [L, *] narrowing widths (round-4 rewrite)
  c) binary-mux cone over [*, L] (width-major: lanes ride the 128-wide
     minor dim at full utilization; window transposed once per call)
  d) same as (c) but window already [128, L] (no transpose)

Each variant runs CH chunk-extractions per scan step over K steps in a
fori_loop with data dependence.  Usage: python tools/probe_window_layout.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

L = 65024          # qual lanes at bench shapes (8 blocks x rpad/4)
NPF = 5
CH = 64            # extractions per timed iteration (one super-chunk's worth)
K = 20


def bins_dense(win, lp):
    wi = jnp.arange(128, dtype=jnp.int32)
    m_idx = wi[None, :] - lp[:, None]
    return jnp.stack([jnp.sum(jnp.where(m_idx == m, win, 0), axis=1)
                      for m in range(NPF)], 1)


def bins_mux_lmajor(win, lp):
    o = lp
    cur = jnp.concatenate([win, jnp.zeros((L, 32), win.dtype)], axis=1)
    w = 128
    while w > 8:
        h = w // 2
        hi = o >= h
        cur = jnp.where(hi[:, None], cur[:, h:h + h + 16], cur[:, :h + 16])
        o = o - jnp.where(hi, h, 0)
        w = h
    qi = jnp.arange(cur.shape[1], dtype=jnp.int32)
    m_idx = qi[None, :] - o[:, None]
    return jnp.stack([jnp.sum(jnp.where(m_idx == m, cur, 0), axis=1)
                      for m in range(NPF)], 1)


def bins_mux_wmajor(winT, lp):
    o = lp
    cur = jnp.concatenate([winT, jnp.zeros((32, L), winT.dtype)], axis=0)
    w = 128
    while w > 8:
        h = w // 2
        hi = o >= h
        cur = jnp.where(hi[None, :], cur[h:h + h + 16], cur[:h + 16])
        o = o - jnp.where(hi, h, 0)
        w = h
    qi = jnp.arange(cur.shape[0], dtype=jnp.int32)
    m_idx = qi[:, None] - o[None, :]
    return jnp.stack([jnp.sum(jnp.where(m_idx == m, cur, 0), axis=0)
                      for m in range(NPF)], 1)


def run(name, fn, win, transpose):
    def loop(w0, lp0):
        def body(i, carry):
            acc, lp = carry
            w = w0 + (i - i)
            wv = w.T if transpose else w
            for c in range(CH):
                p = fn(wv, lp)
                lp = (lp + p[:, 0] % 3 + 1) % 96
                acc = acc + p.sum()
            return acc, lp
        return jax.lax.fori_loop(0, K, body,
                                 (jnp.int32(0), jnp.zeros((L,), jnp.int32)))

    f = jax.jit(loop)
    lp0 = jnp.zeros((L,), jnp.int32)
    t0 = time.time(); jax.block_until_ready(f(win, lp0)); c = time.time() - t0
    t0 = time.time(); jax.block_until_ready(f(win, lp0))
    dt = (time.time() - t0) / (K * CH)
    per_sym = dt / 8 * 1e9
    print(f"{name:24s} {dt*1e6:8.1f} us/chunk  {per_sym:6.1f} ns/sym-row "
          f"[compile {c:.0f}s]", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, "L =", L, flush=True)
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.integers(0, 1 << 30, (L, 128), np.int32))
    winT = jnp.asarray(np.asarray(win).T.copy())
    run("a dense [L,128]", bins_dense, win, False)
    run("b mux [L,*]", bins_mux_lmajor, win, False)
    run("c mux [*,L] +transpose", bins_mux_wmajor, win, True)
    run("d mux [*,L] native", bins_mux_wmajor, winT, False)


if __name__ == "__main__":
    main()
