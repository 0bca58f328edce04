"""Compile-time scaling probe for the Pallas decode kernel on TPU."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dsrc_tpu.parallel import uniform_pipeline as UP
from dsrc_tpu.ops import rans_pallas as RP

RPAD = 32768
G = 16


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    for p in [int(a) for a in sys.argv[1:]] or [13, 25, 50, 100]:
        nsym = 64
        mat = jnp.asarray(rng.integers(0, nsym, (RPAD, p)), jnp.int32)
        os.environ["DSRC_TPU_PALLAS"] = "0"
        enc = jax.jit(UP.encode_positional, static_argnums=(2, 3))
        payload, nwords, states, table = enc(mat, jnp.int32(RPAD), nsym, G)
        os.environ["DSRC_TPU_PALLAS"] = "auto"
        t0 = time.time()
        out = RP.decode_positional_tpu(payload, states, nwords, table,
                                       jnp.int32(RPAD), p, RPAD, nsym, G)
        ok = bool(jnp.all(out == mat))
        dt1 = time.time() - t0
        t0 = time.time()
        out = RP.decode_positional_tpu(payload, states, nwords, table,
                                       jnp.int32(RPAD), p, RPAD, nsym, G)
        _ = bool(jnp.all(out == mat))
        dt2 = time.time() - t0
        print(f"p={p:4d} t={G*p:5d} first {dt1:7.2f}s warm {dt2*1e3:8.1f} ms"
              f" ok={ok}", flush=True)


if __name__ == "__main__":
    main()
