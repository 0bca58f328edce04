"""Round-trip tests for the epoch-adaptive context rANS codec (ops/ctx.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dsrc_tpu.ops import ctx as C
from dsrc_tpu.ops import rans as R
from dsrc_tpu.ops.streams import serialize_rans, deserialize_rans
from dsrc_tpu.utils.bitio import BitReader, BitWriter


def _markov_syms(n, nsym, seed=0, stickiness=0.85):
    rng = np.random.default_rng(seed)
    out = np.empty(n, np.int32)
    s = 0
    stay = rng.random(n)
    jump = rng.integers(0, nsym, n)
    for i in range(n):
        s = s if stay[i] < stickiness else int(jump[i])
        out[i] = s
    return out


@pytest.mark.parametrize("order,nsym,sym_bits,n", [
    (2, 4, 2, 5000),
    (0, 4, 2, 1000),
    (3, 4, 2, 4097),
    (1, 8, 3, 3000),
])
def test_orderk_roundtrip(order, nsym, sym_bits, n):
    syms = _markov_syms(n, nsym, seed=order + n)
    num_lanes = 64
    cap = -(-n // num_lanes) * num_lanes
    arr = jnp.asarray(np.pad(syms, (0, cap - n)))
    t_steps = cap // num_lanes
    edges = C.band_edges(t_steps)
    enc = C.encode_orderk(arr, n, order, sym_bits, nsym, num_lanes, edges)
    dec = C.decode_orderk(enc["payload"], enc["states"], n, t_steps,
                          order, sym_bits, nsym, num_lanes, edges,
                          nwords=enc["nwords"])
    np.testing.assert_array_equal(np.asarray(dec)[:n], syms)


def test_orderk_hash_mul_roundtrip():
    n, nsym = 4000, 8
    syms = _markov_syms(n, nsym, seed=7)
    num_lanes = 32
    cap = -(-n // num_lanes) * num_lanes
    arr = jnp.asarray(np.pad(syms, (0, cap - n)))
    t_steps = cap // num_lanes
    edges = C.band_edges(t_steps)
    kw = dict(order=4, sym_bits=3, nsym=nsym, num_lanes=num_lanes,
              edges=edges, hash_mul=5)
    enc = C.encode_orderk(arr, n, **kw)
    dec = C.decode_orderk(enc["payload"], enc["states"], n, t_steps,
                          nwords=enc["nwords"], **kw)
    np.testing.assert_array_equal(np.asarray(dec)[:n], syms)


def test_orderk_compresses_markov():
    n = 32768
    syms = _markov_syms(n, 4, seed=1, stickiness=0.9)
    num_lanes = 64
    arr = jnp.asarray(syms)
    t_steps = -(-n // num_lanes)
    edges = C.band_edges(t_steps)
    enc = C.encode_orderk(arr, n, 2, 2, 4, num_lanes, edges)
    nbytes = 2 * int(np.asarray(enc["nwords"]).sum()) + 4 * num_lanes
    # sticky markov entropy is ~0.9 bits/sym; require clearly better than 2-bit
    assert nbytes < n * 1.6 / 8


def test_rans_stream_serialization_roundtrip():
    n = 3000
    syms = _markov_syms(n, 4, seed=3)
    num_lanes = 16
    arr = jnp.asarray(syms)
    t_steps = -(-n // num_lanes)
    edges = C.band_edges(t_steps)
    enc = C.encode_orderk(arr, n, 1, 2, 4, num_lanes, edges)
    w = BitWriter()
    serialize_rans(w, n, enc["payload"], enc["nwords"], enc["states"])
    blob = w.getvalue()
    n2, payload, states, nwords = deserialize_rans(BitReader(blob))
    assert n2 == n
    dec = C.decode_orderk(jnp.asarray(payload), jnp.asarray(states), n,
                          t_steps, 1, 2, 4, num_lanes, edges)
    np.testing.assert_array_equal(np.asarray(dec)[:n], syms)
