"""Round-trip of the fully device-resident pipeline (flagship bench path)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dsrc_tpu.parallel import device_pipeline as DP
from dsrc_tpu.utils.synth import make_fastq, make_fastq_fast

CAP = 32768
RCAP = 512


@pytest.mark.parametrize("d,q", [(0, 0), (3, 2)])
def test_device_roundtrip(d, q):
    data = np.frombuffer(make_fastq(80, 70, seed=d + q), np.uint8)
    block = jnp.asarray(np.pad(data, (0, CAP - len(data))))
    comp = DP.compress_block_device(block, jnp.int32(len(data)),
                                    CAP, RCAP, d * 3, q)
    out, total = DP.decompress_block_device(comp, CAP, RCAP, d * 3, q)
    assert int(total) == len(data)
    np.testing.assert_array_equal(np.asarray(out)[:len(data)], data)
    assert int(comp["comp_bytes"]) < len(data)


def test_device_roundtrip_with_n_bases():
    data = np.frombuffer(make_fastq(60, 80, n_base_prob=0.05, seed=3),
                         np.uint8)
    block = jnp.asarray(np.pad(data, (0, CAP - len(data))))
    comp = DP.compress_block_device(block, jnp.int32(len(data)),
                                    CAP, RCAP, 3, 1)
    out, total = DP.decompress_block_device(comp, CAP, RCAP, 3, 1)
    np.testing.assert_array_equal(np.asarray(out)[:len(data)], data)
