"""Round-trip of the gather-free uniform-record fast path."""
import numpy as np
import pytest

import jax.numpy as jnp

from dsrc_tpu.parallel import uniform_pipeline as UP
from dsrc_tpu.utils.synth import make_fastq_fast


def _prep(n_rec, read_len, seed=0):
    data = make_fastq_fast(n_rec, read_len, seed=seed, fixed_width=True)
    spec = UP.detect_spec(data[:4096])
    assert spec is not None
    rec = spec.rec_bytes
    r = len(data) // rec
    rpad = -(-r // UP.GROUP) * UP.GROUP
    mat = np.zeros((rpad, rec), np.uint8)
    mat[:r] = np.frombuffer(data, np.uint8).reshape(r, rec)
    return spec, jnp.asarray(mat), r, rpad


@pytest.mark.parametrize("n_rec,read_len", [(200, 80), (333, 101)])
def test_uniform_roundtrip(n_rec, read_len):
    spec, mat, r, rpad = _prep(n_rec, read_len, seed=n_rec)
    assert bool(UP.check_uniform(mat, spec, jnp.int32(r)))
    comp = UP.compress_uniform(mat, jnp.int32(r), spec, rpad)
    out = UP.decompress_uniform(comp, spec, rpad)
    assert bool(UP.mats_equal(out, mat, jnp.int32(r)))
    assert int(comp["comp_bytes"]) < r * spec.rec_bytes


def test_uniform_detect_rejects_nonuniform():
    assert UP.detect_spec(b"@r1\nACGT\n+\nIII\n") is None      # qual len
    assert UP.detect_spec(b"@r1\nACGT\n+x\nIIII\n") is None    # plus text
    assert UP.detect_spec(b"not fastq at all") is None


def test_uniform_check_rejects_bad_block():
    spec, mat, r, rpad = _prep(50, 60)
    bad = np.asarray(mat).copy()
    bad[10, 0] = ord("X")
    assert not bool(UP.check_uniform(jnp.asarray(bad), spec, jnp.int32(r)))
