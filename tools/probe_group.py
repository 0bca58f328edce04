"""Group-size scaling of the XLA encode/decode wavefronts, timed with an
in-jit fori_loop (K reps, data-dependent carry) to kill tunnel dispatch
noise.  Usage: python tools/probe_group.py [G ...]   (default 16 8 4)"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ["DSRC_TPU_PALLAS"] = "0"

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dsrc_tpu.parallel import uniform_pipeline as UP

RPAD, P, NSYM, B, K = 32768, 100, 64, 8, 5


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    mat = jnp.asarray(np.minimum(
        rng.geometric(0.15, (B, RPAD, P)) - 1, NSYM - 1).astype(np.int32))
    nr = jnp.int32(RPAD)
    nsyms = B * RPAD * P

    for g in [int(a) for a in sys.argv[1:]] or [16, 8, 4]:
        def enc_loop(m):
            def body(i, acc):
                mm = m ^ (i & 1)  # forces re-encode each rep
                p_, n_, s_, t_ = jax.vmap(
                    lambda x: UP.encode_positional(x, nr, NSYM, g))(mm)
                return acc + n_.sum() + p_.sum() + s_.sum().astype(jnp.int32)
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        f = jax.jit(enc_loop)
        t0 = time.time(); r = int(f(mat)); comp = time.time() - t0
        t0 = time.time(); r = int(f(mat)); dt = (time.time() - t0) / K
        print(f"G={g:2d} enc {dt*1e3:7.1f} ms ({nsyms/dt/1e9:.2f} Gsym/s)"
              f" [compile {comp:.0f}s]", flush=True)

        pp, nn, ss, tt = jax.vmap(
            lambda x: UP.encode_positional(x, nr, NSYM, g))(mat)

        def dec_loop(p_, s_, n_, t_):
            def body(i, acc):
                out = jax.vmap(lambda a, b, c, d: UP.decode_positional(
                    a, b ^ jnp.uint32(0), c, d, nr, P, RPAD, NSYM, g))(
                        p_ + (i - i), s_, n_, t_)
                return acc + out.sum()
            return jax.lax.fori_loop(0, K, body, jnp.int32(0))

        fd = jax.jit(dec_loop)
        t0 = time.time(); r = int(fd(pp, ss, nn, tt)); comp = time.time() - t0
        t0 = time.time(); r = int(fd(pp, ss, nn, tt)); dt = (time.time() - t0) / K
        print(f"G={g:2d} dec {dt*1e3:7.1f} ms ({nsyms/dt/1e9:.2f} Gsym/s)"
              f" [compile {comp:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
