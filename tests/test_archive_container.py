"""Archive container: random access, record counts, corruption handling."""
import io

import pytest

from dsrc_tpu.api import DsrcModule
from dsrc_tpu.config import DsrcException, InputParameters
from dsrc_tpu.io.archive import ArchiveReader
from dsrc_tpu.models.block import BlockCodec, BlockShape
from dsrc_tpu.utils.synth import make_fastq


def _archive(data, **kw):
    p = InputParameters(fastq_block_size_bytes=32768, **kw)
    arch = io.BytesIO()
    DsrcModule(p).compress(io.BytesIO(data), arch)
    arch.seek(0)
    return arch


def test_random_block_access():
    data = make_fastq(900, 60, seed=70)
    arch = _archive(data)
    r = ArchiveReader(arch)
    assert r.num_blocks >= 3
    assert sum(r.block_records) == 900 == r.total_records
    codec = BlockCodec(BlockShape.for_block_size(r.block_size_bytes),
                       r.settings, r.dataset)
    # decode only the LAST block without touching the others
    text = codec.decompress(r.read_block(r.num_blocks - 1))
    tail_records = r.block_records[-1]
    assert bytes(text).count(b"\n") == 4 * tail_records
    assert data.endswith(bytes(text))


def test_crc_catches_corruption():
    data = make_fastq(300, 60, seed=71)
    arch = _archive(data, calculate_crc32=True)
    blob = bytearray(arch.getvalue())
    r = ArchiveReader(io.BytesIO(bytes(blob)))
    # flip one byte in the middle of the first block's payload
    off = 32 + r.block_sizes[0] // 2
    blob[off] ^= 0xFF
    out = io.BytesIO()
    with pytest.raises(DsrcException):
        DsrcModule().decompress(io.BytesIO(bytes(blob)), out)


def test_block_index_out_of_range():
    data = make_fastq(100, 50, seed=72)
    r = ArchiveReader(_archive(data))
    with pytest.raises(DsrcException):
        r.read_block(r.num_blocks)
