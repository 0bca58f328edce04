"""Minimal discriminator: are Pallas-kernel output arrays misread when
consumed directly on-device by later XLA executables (layout mismatch),
while D2H copies of them are correct?"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dsrc_tpu.parallel import uniform_pipeline as UP

RPAD, G, P, NSYM = 32768, 16, 100, 64


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    mat_np = np.minimum(rng.geometric(0.15, (RPAD, P)) - 1, NSYM - 1) \
        .astype(np.int32)
    mat = jnp.asarray(mat_np)
    nr = jnp.int32(RPAD - 37)
    act = np.arange(RPAD)[:, None] < RPAD - 37

    os.environ["DSRC_TPU_PALLAS"] = "0"
    encX = jax.jit(UP.encode_positional, static_argnums=(2, 3))
    decX = jax.jit(UP.decode_positional, static_argnums=(5, 6, 7, 8))
    pX, nX, sX, tX = encX(mat, nr, NSYM, G)
    out1 = np.asarray(decX(pX, sX, nX, tX, nr, P, RPAD, NSYM, G))
    print("A xla-dec(xla-enc direct):  bad =",
          int(((out1 != mat_np) & act).sum()), flush=True)

    os.environ["DSRC_TPU_PALLAS"] = "1"
    encP = jax.jit(UP.encode_positional, static_argnums=(2, 3))
    pP, nP, sP, tP = encP(mat, nr, NSYM, G)
    out2 = np.asarray(decX(pP, sP, nP, tP, nr, P, RPAD, NSYM, G))
    print("B xla-dec(pallas-enc direct): bad =",
          int(((out2 != mat_np) & act).sum()), flush=True)

    pH = jnp.asarray(np.asarray(pP))
    sH = jnp.asarray(np.asarray(sP))
    nH = jnp.asarray(np.asarray(nP))
    tH = jnp.asarray(np.asarray(tP))
    out3 = np.asarray(decX(pH, sH, nH, tH, nr, P, RPAD, NSYM, G))
    print("C xla-dec(pallas-enc via host): bad =",
          int(((out3 != mat_np) & act).sum()), flush=True)

    # which input is the poisoned one? swap one at a time (device pallas
    # array in an otherwise host-clean set)
    for name, args in [
        ("payload", (pP, sH, nH, tH)),
        ("states", (pH, sP, nH, tH)),
        ("nwords", (pH, sH, nP, tH)),
        ("table", (pH, sH, nH, tP)),
    ]:
        o = np.asarray(decX(*args, nr, P, RPAD, NSYM, G))
        print(f"D swap {name}: bad =", int(((o != mat_np) & act).sum()),
              flush=True)


if __name__ == "__main__":
    main()
