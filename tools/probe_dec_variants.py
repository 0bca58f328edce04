"""Decode-substep variants A/B'd in ONE process (same device state, same
compile session) to cut through the run-to-run noise of this dev env.

Axes:
  search orientation: W-major [k, L] intermediates vs L-major [L, k]
  pair fetch: pair_at ([L]-op select chain on [npair, L]) vs dense
              [L, npair] masked sum (round-3 form)

Shapes: qual-like stream at bench geometry (A=64, G=8, rpad 32768, B=8).
Usage: python tools/probe_dec_variants.py
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
    PROB_BITS, RANS_L, SUPER, TILE, TILE_BITS, UNROLL, _MASK,
    cum_from_freqs, pair_at, payload_window)
from dsrc_tpu.parallel import uniform_pipeline as UP

B, RPAD, P, NSYM, G, K = 8, 32768, 100, 64, 8, 5


def decode_variant(payload, states, nwords, table, num_rec, p, rpad,
                   nsym, group, wmajor_search: bool, use_pair_at: bool):
    ll = rpad // group
    t_steps = group * p
    lane_base = jnp.arange(ll, dtype=jnp.int32) * group
    npf = UNROLL // 2 + 1
    pk = jnp.arange(npf, dtype=jnp.int32)
    cumfull = cum_from_freqs(table)
    nt = -(-payload.shape[1] // TILE) + 1
    x = states
    wptr = (2 * payload.shape[1] - nwords).astype(jnp.int32)
    hi_n = nsym // 8
    hm = jnp.arange(hi_n, dtype=jnp.int32)
    k8 = jnp.arange(8, dtype=jnp.int32)

    def search_w(slot, row):
        row8 = row[::8]
        ge_h = (slot[None, :] >= row8[1:hi_n, None]).astype(jnp.int32)
        hi = ge_h.sum(axis=0)
        oh_h = (hi[None, :] == hm[:, None]).astype(jnp.int32)
        rowmat = row[:nsym].reshape(hi_n, 8)
        fine = jnp.zeros((8, slot.shape[0]), jnp.int32)
        for m in range(hi_n):
            fine = fine + oh_h[m][None, :] * rowmat[m][:, None]
        row9 = (oh_h * row8[1:hi_n + 1, None]).sum(axis=0)
        ge_l = (slot[None, :] >= fine[1:]).astype(jnp.int32)
        lo = ge_l.sum(axis=0)
        sym = (hi << 3) + lo
        oh_l = (lo[None, :] == k8[:, None]).astype(jnp.int32)
        cu = (oh_l * fine).sum(axis=0)
        fine9 = jnp.concatenate([fine[1:], row9[None, :]], axis=0)
        f = (oh_l * fine9).sum(axis=0) - cu
        return sym, f, cu

    def search_l(slot, row):
        row8 = row[::8]
        ge_h = (slot[:, None] >= row8[None, 1:hi_n]).astype(jnp.int32)
        hi = ge_h.sum(axis=1)
        oh_h = (hi[:, None] == hm[None, :]).astype(jnp.int32)
        rowmat = row[:nsym].reshape(hi_n, 8)
        fine = jnp.zeros((slot.shape[0], 8), jnp.int32)
        for m in range(hi_n):
            fine = fine + oh_h[:, m:m + 1] * rowmat[m][None, :]
        row9 = (oh_h * row8[None, 1:hi_n + 1]).sum(axis=1)
        ge_l = (slot[:, None] >= fine[:, 1:]).astype(jnp.int32)
        lo = ge_l.sum(axis=1)
        sym = (hi << 3) + lo
        oh_l = (lo[:, None] == k8[None, :]).astype(jnp.int32)
        cu = (oh_l * fine).sum(axis=1)
        fine9 = jnp.concatenate([fine[:, 1:], row9[:, None]], axis=1)
        f = (oh_l * fine9).sum(axis=1) - cu
        return sym, f, cu

    def substep(x, o, pairs, phase, t):
        act = (t < t_steps) & ((lane_base + t // p) < num_rec)
        row = jax.lax.dynamic_slice(cumfull, (t % p, 0), (1, nsym + 1))[0]
        slot = (x & _MASK).astype(jnp.int32)
        sym, f, cu = (search_w if wmajor_search else search_l)(slot, row)
        fu = jnp.where(act, f, 1).astype(jnp.uint32)
        xn = fu * (x >> np.uint32(PROB_BITS)) + slot.astype(jnp.uint32) \
            - cu.astype(jnp.uint32)
        need = act & (xn < RANS_L)
        lp = (phase + o) >> 1
        half = (phase + o) & 1
        if use_pair_at:
            pair = pair_at(pairs, lp)
        else:
            pair = jnp.sum(jnp.where(lp[:, None] == pk[None, :],
                                     pairs.T, 0), axis=1)
        w = (jnp.where(half == 1, pair >> 16, pair) & 0xFFFF) \
            .astype(jnp.uint32)
        xn = jnp.where(need, (xn << np.uint32(16)) | w, xn)
        x = jnp.where(act, xn, x)
        o = o + need.astype(jnp.int32)
        return x, o, sym

    def window_pairs_v(win, lp):
        wi = jnp.arange(2 * TILE, dtype=jnp.int32)
        m_idx = wi[None, :] - lp[:, None]
        return jnp.stack([jnp.sum(jnp.where(m_idx == m, win, 0), axis=1)
                          for m in range(npf)], 0)

    chunks = (-(-t_steps // UNROLL))
    sups = -(-chunks // SUPER)

    def sup_step(state, ts0):
        x, wptr = state
        bt = (wptr >> 1) >> TILE_BITS
        win = payload_window(payload, bt, nt)
        base = bt << (TILE_BITS + 1)
        syms = []
        for ci in range(SUPER):
            pairs = window_pairs_v(win, (wptr - base) >> 1)
            phase = wptr & 1
            o = jnp.zeros((ll,), jnp.int32)
            for ui in range(UNROLL):
                x, o, sym = substep(x, o, pairs, phase,
                                    ts0 + ci * UNROLL + ui)
                syms.append(sym)
            wptr = wptr + o
        return (x, wptr), jnp.stack(syms)

    (x, wptr), syms = jax.lax.scan(
        sup_step, (x, wptr),
        jnp.arange(sups, dtype=jnp.int32) * (SUPER * UNROLL))
    return UP._ungroup_lanes(
        syms.reshape(sups * SUPER * UNROLL, ll)[:t_steps], group, p)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    mats = jnp.asarray(np.minimum(
        rng.geometric(0.15, (B, RPAD, P)) - 1, NSYM - 1).astype(np.int32))
    nr = jnp.int32(RPAD)
    comp = jax.jit(jax.vmap(
        lambda m: UP.encode_positional(m, nr, NSYM, G)))(mats)
    comp = jax.tree.map(lambda v: v.block_until_ready(), comp)
    pp, nn, ss, tt = comp
    nsyms = B * RPAD * P

    for name, wm, pa in [("W-search + pair_at  (current)", True, True),
                         ("L-search + pair_at", False, True),
                         ("W-search + dense-sum", True, False),
                         ("L-search + dense-sum (round3)", False, False)]:
        def loop(p_, s_, n_, t_):
            def body(i, acc):
                out = jax.vmap(lambda a, b, c, d: decode_variant(
                    a, b ^ jnp.uint32(0), c, d, nr, P, RPAD, NSYM, G,
                    wm, pa))(p_ + (i - i), s_, n_, t_)
                return acc + out.sum()
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        f = jax.jit(loop)
        t0 = time.time(); int(f(pp, ss, nn, tt)); c = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time(); int(f(pp, ss, nn, tt))
            ts.append((time.time() - t0) / K)
        dt = min(ts)
        ok = bool((jax.vmap(lambda a, b, c, d: decode_variant(
            a, b, c, d, nr, P, RPAD, NSYM, G, wm, pa))(pp, ss, nn, tt)
            == mats).all())
        print(f"{name:32s} {dt*1e3:6.1f} ms ({nsyms/dt/1e9:.2f} Gsym/s) "
              f"ok={ok} [compile {c:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
