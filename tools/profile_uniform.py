"""Stage-level profiling of the uniform pipeline on the live TPU.

Times encode_positional / decode_positional per stream and pack_dna with
ALL outputs live (sums pulled to host — the only true sync under axon),
varying GROUP to test the t_steps^2 payload-traffic hypothesis.

Usage:  python tools/profile_uniform.py [GROUP ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dsrc_tpu.parallel import uniform_pipeline as UP
from dsrc_tpu.utils.synth import make_fastq_fast

BATCH = 8
RPAD = 32768
READ_LEN = 100


def sync(*arrs):
    tot = 0
    for a in arrs:
        tot += int(jnp.sum(a.astype(jnp.int32) if a.dtype != jnp.int32 else a))
    return tot


def timeit(fn, *args, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        sync(*jax.tree_util.tree_leaves(out))
        best = min(best, time.time() - t0)
    return best, out


def main():
    stages = set(os.environ.get("PROF_STAGES", "enc,dec,tab,dna").split(","))
    groups = [int(g) for g in sys.argv[1:]] or [16, 4]
    print("platform:", jax.devices()[0].platform)
    data = np.frombuffer(
        make_fastq_fast(RPAD * BATCH, READ_LEN, seed=1, fixed_width=True),
        np.uint8)
    spec = UP.detect_spec(bytes(data[:4096]))
    mat = jnp.asarray(data.reshape(BATCH, RPAD, spec.rec_bytes))
    sync(mat)
    s = spec
    t1 = 1 + s.title_len
    s0 = t1 + 1
    s1 = s0 + s.read_len
    q0 = s1 + 3
    qual = jnp.clip(mat[:, :, q0:q0 + s.read_len].astype(jnp.int32) - 33,
                    0, UP.QUAL_A - 1)
    title = jnp.clip(mat[:, :, 1:t1].astype(jnp.int32) - 32, 0,
                     UP.TITLE_A - 1)
    seq = mat[:, :, s0:s1]
    nr = jnp.int32(RPAD)
    mb = len(data) / (1 << 20)
    print(f"input {mb:.0f} MB, batch {BATCH}, rpad {RPAD}, "
          f"title_len {s.title_len}, read_len {s.read_len}")

    for g in groups:
        if "enc" not in stages:
            break
        enc_q = jax.jit(jax.vmap(
            lambda m: UP.encode_positional(m, nr, UP.QUAL_A, g)))
        enc_t = jax.jit(jax.vmap(
            lambda m: UP.encode_positional(
                UP.title_delta(m, g), nr, UP.TITLE_A, g)))
        t0 = time.time()
        dt_q, comp_q = timeit(enc_q, qual, n=1)
        dt_t, comp_t = timeit(enc_t, title, n=1)
        print(f"G={g:2d} first-call (incl compile): qual {dt_q:.2f}s "
              f"title {dt_t:.2f}s", flush=True)
        dt_q, comp_q = timeit(enc_q, qual)
        dt_t, comp_t = timeit(enc_t, title)
        print(f"G={g:2d} enc qual {dt_q*1e3:7.1f} ms ({mb/ (dt_q+1e-9):6.0f}"
              f" MB/s-of-input)  enc title {dt_t*1e3:7.1f} ms", flush=True)
        qp, qn, qs, qtab = comp_q
        tp, tn, ts, ttab = comp_t
        csize = 2 * (int(jnp.sum(qn)) + int(jnp.sum(tn)))
        print(f"G={g:2d} payload bytes {csize} "
              f"({csize * 8 / (BATCH * RPAD * (s.read_len + s.title_len)):.3f}"
              f" bits/sym)", flush=True)
        if "dec" not in stages:
            continue
        dec_q = jax.jit(jax.vmap(lambda p, st, nw, tab: UP.decode_positional(
            p, st, nw, tab, nr, s.read_len, RPAD, UP.QUAL_A, g)))
        dec_t = jax.jit(jax.vmap(lambda p, st, nw, tab: UP.decode_positional(
            p, st, nw, tab, nr, s.title_len, RPAD, UP.TITLE_A, g,
            delta=True)))
        dt, out_q = timeit(dec_q, qp, qs, qn, qtab, n=1)
        dt2, out_t = timeit(dec_t, tp, ts, tn, ttab, n=1)
        print(f"G={g:2d} dec first-call: qual {dt:.2f}s title {dt2:.2f}s",
              flush=True)
        dt_dq, out_q = timeit(dec_q, qp, qs, qn, qtab)
        dt_dt, out_t = timeit(dec_t, tp, ts, tn, ttab)
        ok_q = bool(jnp.all(out_q == qual))
        ok_t = bool(jnp.all(out_t == title))
        print(f"G={g:2d} dec qual {dt_dq*1e3:7.1f} ms  dec title "
              f"{dt_dt*1e3:7.1f} ms  ok={ok_q and ok_t}", flush=True)

    # isolate the XLA-side table build (hist + quantize) that both encode
    # paths share, for G=16
    if "tab" not in stages:
        return
    import jax.numpy as jnp2
    from dsrc_tpu.ops.rans import quantize_counts

    def tab_only(m, nsym, g):
        ll = RPAD // g
        lanes = UP._group_lanes(m, g)
        t_steps = g * m.shape[1]
        pos_idx = jnp2.arange(t_steps, dtype=jnp2.int32) % m.shape[1]
        rec_idx = (jnp2.arange(ll, dtype=jnp2.int32) * g)[None, :] + \
            (jnp2.arange(t_steps, dtype=jnp2.int32) // m.shape[1])[:, None]
        active = rec_idx < nr
        lanes = jnp2.where(active, lanes, 0)
        hist = UP._onehot_hist(lanes, active, pos_idx, m.shape[1], nsym)
        return quantize_counts(hist)

    tq = jax.jit(jax.vmap(lambda m: tab_only(m, UP.QUAL_A, 16)))
    dt, _ = timeit(tq, qual)
    print(f"table-build-old qual {dt*1e3:7.1f} ms", flush=True)
    tt = jax.jit(jax.vmap(lambda m: tab_only(m, UP.TITLE_A, 16)))
    dt, _ = timeit(tt, title)
    print(f"table-build-old title {dt*1e3:7.1f} ms", flush=True)
    tq2 = jax.jit(jax.vmap(lambda m: quantize_counts(
        UP._pos_hist(m, nr, UP.QUAL_A))))
    dt, _ = timeit(tq2, qual)
    print(f"table-build-matmul qual {dt*1e3:7.1f} ms", flush=True)
    tt2 = jax.jit(jax.vmap(lambda m: quantize_counts(
        UP._pos_hist(m, nr, UP.TITLE_A))))
    dt, _ = timeit(tt2, title)
    print(f"table-build-matmul title {dt*1e3:7.1f} ms", flush=True)

    if "dna" not in stages:
        return
    packf = jax.jit(jax.vmap(lambda m: UP.pack_dna(m, nr, s.read_len)))
    dt, packed = timeit(packf, seq)
    print(f"pack_dna {dt*1e3:7.1f} ms", flush=True)
    unpackf = jax.jit(jax.vmap(
        lambda p, e, c: UP.unpack_dna(p, e, c, RPAD, s.read_len)))
    dt, _ = timeit(unpackf, *packed)
    print(f"unpack_dna {dt*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
