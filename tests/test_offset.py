"""Per-block quality-offset robustness: a block whose minimum quality byte
is below the dataset offset detected from the FIRST block must still
round-trip exactly (the offset is re-chosen per block and transmitted in
the block meta; reference stays reversible by uchar wraparound,
RecordsProcessor.cpp:223-293)."""
import io

import pytest

from dsrc_tpu.api import DsrcModule
from dsrc_tpu.config import DsrcException, InputParameters


def _fastq(records):
    return "".join(records).encode()


def _rec(i, seq, qual):
    return f"@read.{i} x\n{seq}\n+\n{qual}\n"


def test_quality_below_detected_offset_roundtrips():
    # First ~1KB of records: quality all 'I' (73) -> offset 64 detected
    # (qmin >= 64 and qmax <= 105, FastqParser.cpp offset rules).  A later
    # block contains ';' (59) < 64, which would clip to 0 in the
    # q - offset transform without the per-block offset fallback.
    recs = []
    for i in range(60):
        ln = 40 + (i % 3)            # varying lengths -> generic path
        recs.append(_rec(i, "ACGT" * 10 + "A" * (ln - 40), "I" * ln))
    for i in range(60, 120):
        ln = 40 + (i % 3)
        q = "I" * (ln - 1) + (";" if i == 100 else "I")
        recs.append(_rec(i, "ACGT" * 10 + "A" * (ln - 40), q))
    data = _fastq(recs)
    mod = DsrcModule(InputParameters(dna_compression_level=1,
                                     fastq_block_size_bytes=4096))
    arch = io.BytesIO()
    mod.compress(io.BytesIO(data), arch)
    arch.seek(0)
    out = io.BytesIO()
    mod.decompress(arch, out)
    assert out.getvalue() == data


def test_quality_span_too_wide_is_an_error_not_corruption():
    # quality bytes spanning >= FOLD_BASE values (needs a byte outside
    # printable ASCII) cannot be coded reversibly at any offset; must
    # raise, never round-trip wrong
    qual = ("!" * 39).encode() + bytes([200])           # span 33..200
    data = (b"@read.0 x\n" + b"ACGT" * 10 + b"\n+\n" + qual + b"\n"
            + _fastq([_rec(1, "ACGT" * 10 + "A", "I" * 41)]))
    mod = DsrcModule(InputParameters(dna_compression_level=1))
    with pytest.raises(DsrcException, match="quality bytes span"):
        mod.compress(io.BytesIO(data), io.BytesIO())
