"""Wire-format self-description: uniform/semi block headers carry their
layout parameters (lane groups, alphabets, PROB_BITS), so retuning the
encoder's module constants can never break archives already written
(reference analogue: the self-describing footer, DsrcFile.cpp:133-170).
"""
import io

import jax.numpy as jnp
import numpy as np
import pytest

from dsrc_tpu.config import DsrcException
from dsrc_tpu.models.block import (
    BLOCK_UNIFORM, BlockCodec, BlockShape, serialize_uniform_block,
    stage_uniform_block)
from dsrc_tpu.config import CompressionSettings, DatasetType
from dsrc_tpu.parallel import uniform_pipeline as UP
from dsrc_tpu.utils.synth import make_fastq_fast


def _codec(cap=1 << 16):
    return BlockCodec(BlockShape(cap=cap, rcap=4096),
                      CompressionSettings(dna_order=0, quality_order=0),
                      DatasetType(quality_offset=33))


def test_decode_follows_transmitted_wire_not_module_constants():
    """Encode with NON-default lane groups/delta group; the stock decoder
    (which would use the module constants) must still round-trip, because
    every parameter rides the block header."""
    data = make_fastq_fast(300, 48, seed=5, fixed_width=True)
    staged = stage_uniform_block(np.frombuffer(data, np.uint8))
    assert staged is not None
    mat, num_rec, spec, rpad = staged
    wire = UP.Wire(title_group=8, title_code_group=4, qual_group=4)
    assert wire != UP.WIRE_DEFAULT
    comp = UP.compress_uniform(mat, jnp.int32(num_rec), spec, rpad,
                               wire=wire)
    blob, _ = serialize_uniform_block(comp, spec, num_rec, rpad, wire=wire)
    out = _codec().decompress(blob)
    assert out.tobytes() == data


def test_bad_prob_bits_is_a_clear_error():
    data = make_fastq_fast(300, 48, seed=6, fixed_width=True)
    codec = _codec()
    blob, _ = codec.compress(np.frombuffer(data, np.uint8))
    assert blob[:1] == bytes([BLOCK_UNIFORM])
    # the PROB_BITS byte sits right after the 4 header varints; for these
    # small values each varint is 1-2 bytes — find it by decoding
    from dsrc_tpu.utils.bitio import BitReader
    r = BitReader(blob)
    r.get_byte()
    for _ in range(4):
        r.get_varint()
    pos = r.byte_position
    bad = bytearray(blob)
    bad[pos] = 11            # a PROB_BITS this build does not decode
    with pytest.raises(DsrcException, match="PROB_BITS"):
        codec.decompress(bytes(bad))


def test_old_archive_version_rejected_clearly():
    from dsrc_tpu.io.archive import ArchiveReader, HEADER_SIZE, MAGIC
    buf = io.BytesIO()
    buf.write(MAGIC + bytes([2]) + b"\x00" * (HEADER_SIZE - 5))
    buf.seek(0)
    with pytest.raises(DsrcException, match="older build"):
        ArchiveReader(buf)
