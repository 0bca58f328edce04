"""Encoder-core variants, timed at bench-like shapes (qual stream, G=8).

  A. current rans_encode_from_freqs (W-major window, carried [nt,T,L]
     payload, masked tile flush per chunk)
  B. stacked-ys: flush tiles leave the scan as stacked outputs and are
     assembled into the payload AFTER the scan — payload HBM traffic drops
     from chunks*2*|payload| to |stack|*(nt+1) (~20x at qual shapes)

Outputs must be bit-identical; the timing decides which ships.
Usage: python tools/probe_enc_variants.py
"""
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dsrc_tpu.ops.rans import (
    ENC_UNROLL, RANS_L, TILE, TILE_BITS, _enc_sym,
    cum_from_freqs, quantize_counts, rans_encode_from_freqs)

B, RPAD, P, NSYM, G, K = 8, 32768, 100, 64, 8, 5


def encode_ys(freq, cum, active):
    """Variant B: stacked-ys flush assembly (same wire output as A)."""
    t_steps, l = freq.shape
    u = ENC_UNROLL
    tp = -(-t_steps // u) * u
    wp = -(-(tp + u) // (2 * TILE)) * TILE
    wmax = 2 * wp
    nt = wp // TILE
    pad = ((0, tp - t_steps), (0, 0))
    f32 = jnp.pad(jnp.where(active, freq, 1), pad, constant_values=1) \
        .astype(jnp.uint32).reshape(-1, u, l)
    c32 = jnp.pad(cum, pad).astype(jnp.uint32).reshape(-1, u, l)
    act = jnp.pad(active, pad).reshape(-1, u, l)
    ti = jnp.arange(nt, dtype=jnp.int32)
    qi32 = jnp.arange(32, dtype=jnp.int32)

    def step(carry, inp):
        x, b, win, wt = carry
        f, c, a = inp
        ws0 = wmax - 1 - b
        sb = ((((ws0 >> 1) - ((wt - 1) << TILE_BITS)) - 16) >> 4)
        qbase = ((wt - 1) << TILE_BITS) + (sb << 4)
        blk = jnp.zeros((32, l), jnp.int32)
        le = jnp.zeros((l,), jnp.int32)
        for k in range(u - 1, -1, -1):
            x, w, e = _enc_sym(x, f[k], c[k], a[k])
            ws = ws0 - le
            val = jnp.where((ws & 1) == 1, w << 16, w)
            val = jnp.where(e, val, 0)
            q = (ws >> 1) - qbase
            blk = blk + jnp.where(q[None, :] == qi32[:, None],
                                  val[None, :], 0)
            le = le + e.astype(jnp.int32)
        for s in range(3, 7):
            win = win.at[(s << 4):(s << 4) + 32].add(
                jnp.where((sb == s)[None, :], blk, 0))
        b = b + le
        crossed = (((wmax - 1 - b) >> 1) >> TILE_BITS) < wt
        flush = jnp.where(crossed[None, :], win[TILE:], 0)
        win = jnp.where(
            crossed[None, :],
            jnp.concatenate([jnp.zeros((TILE, l), jnp.int32),
                             win[:TILE]], axis=0), win)
        wt_out = jnp.where(crossed, wt, -1)
        return (x, b, win, wt - crossed.astype(jnp.int32)), (flush, wt_out)

    x0 = jnp.full((l,), RANS_L, jnp.uint32)
    win0 = jnp.zeros((2 * TILE, l), jnp.int32)
    wt0 = jnp.full((l,), nt - 1, jnp.int32)
    (states, nwords, win, wt), (flushes, wts) = jax.lax.scan(
        step, (x0, jnp.zeros((l,), jnp.int32), win0, wt0),
        (f32, c32, act), reverse=True)
    payload = jnp.zeros((nt, TILE, l), jnp.int32)
    for m in range(nt):
        payload = payload.at[m].add(
            jnp.sum(jnp.where((wts == m)[:, None, :], flushes, 0), axis=0))
    payload = payload + jnp.where(
        (wt[None, :] == ti[:, None])[:, None, :], win[None, TILE:, :], 0)
    payload = payload + jnp.where(
        ((wt - 1)[None, :] == ti[:, None])[:, None, :],
        win[None, :TILE, :], 0)
    return payload.reshape(nt * TILE, l).T, nwords, states


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    mats = np.minimum(rng.geometric(0.15, (B, RPAD, P)) - 1,
                      NSYM - 1).astype(np.int32)

    def prep(mat):
        rpad, p = mat.shape
        ll = rpad // G
        t_steps = G * p
        g_idx = jnp.arange(t_steps, dtype=jnp.int32) // p
        rec_idx = (jnp.arange(ll, dtype=jnp.int32) * G)[None, :] \
            + g_idx[:, None]
        active = rec_idx < rpad
        hist = jnp.zeros((p, NSYM), jnp.int32).at[
            jnp.arange(p)[None, :].repeat(rpad, 0), mat].add(1)
        table = quantize_counts(hist)
        cumfull = cum_from_freqs(table)
        packed = (cumfull[:, :NSYM] << 15) | table
        pk = jnp.take_along_axis(
            packed[None].repeat(rpad, 0).reshape(rpad * p, NSYM),
            mat.reshape(-1, 1), axis=1).reshape(rpad, p)
        pl = pk.reshape(ll, G, p).transpose(1, 2, 0).reshape(G * p, ll)
        return pl & 0x7FFF, pl >> 15, active

    fcs = [prep(jnp.asarray(m)) for m in mats]
    f = jnp.stack([a for a, _, _ in fcs])
    c = jnp.stack([b for _, b, _ in fcs])
    a = jnp.stack([d for _, _, d in fcs])

    for name, fn in [("A carried-payload", rans_encode_from_freqs),
                     ("B stacked-ys", encode_ys)]:
        def loop(ff, cc, aa):
            def body(i, acc):
                p_, n_, s_ = jax.vmap(fn)(ff + (i - i), cc, aa)
                return acc + p_.sum() + n_.sum() + s_.sum().astype(jnp.int32)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        g = jax.jit(loop)
        t0 = time.time(); r1 = int(g(f, c, a)); comp = time.time() - t0
        t0 = time.time(); r2 = int(g(f, c, a)); dt = (time.time() - t0) / K
        nsyms = B * RPAD * P
        print(f"{name:20s} {dt*1e3:7.1f} ms ({nsyms/dt/1e9:.2f} Gsym/s) "
              f"[compile {comp:.0f}s] checksum {r2}", flush=True)

    pa = jax.vmap(rans_encode_from_freqs)(f, c, a)
    pb = jax.vmap(encode_ys)(f, c, a)
    same = all(bool((x == y).all()) for x, y in zip(pa, pb))
    print("outputs identical:", same, flush=True)


if __name__ == "__main__":
    main()
