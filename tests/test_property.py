"""Property tests: random record shapes, IUPAC ambiguity codes, extreme
quality distributions — exercising the rare DNA/quality scheme paths
(CTX8/A19/RAW, CONST/RLE) that platform-typical data never hits."""
import io

import numpy as np
import pytest

from dsrc_tpu.api import DsrcModule
from dsrc_tpu.config import InputParameters

IUPAC = b"ACGTNRWSKMDVHBYXU.-"


def _roundtrip(data: bytes, **kw) -> bytes:
    p = InputParameters(fastq_block_size_bytes=32768, **kw)
    m = DsrcModule(p)
    arch = io.BytesIO()
    m.compress(io.BytesIO(data), arch)
    arch.seek(0)
    out = io.BytesIO()
    m.decompress(arch, out)
    return out.getvalue()


def _random_fastq(rng, n_rec, alphabet, qlo, qhi, max_len=90):
    recs = []
    for i in range(n_rec):
        L = int(rng.integers(1, max_len))
        seq = bytes(rng.choice(list(alphabet), L).tolist())
        qual = bytes(rng.integers(qlo, qhi + 1, L).astype(np.uint8).tolist())
        title = f"@r{i} x{rng.integers(0, 9)}".encode()
        recs.append(title + b"\n" + seq + b"\n+\n" + qual + b"\n")
    return b"".join(recs)


@pytest.mark.parametrize("d,q", [(0, 0), (2, 1)])
def test_iupac_rich_roundtrip(d, q):
    rng = np.random.default_rng(d * 7 + q)
    data = _random_fastq(rng, 150, IUPAC, 33, 74)
    assert _roundtrip(data, dna_compression_level=d,
                      quality_compression_level=q) == data


def test_five_symbol_dna_roundtrip():
    # ACGTN with plentiful high-quality N's -> CTX8 path (N can't fold)
    rng = np.random.default_rng(3)
    data = _random_fastq(rng, 200, b"ACGTN", 70, 74)
    assert _roundtrip(data, dna_compression_level=3) == data


def test_constant_quality_roundtrip():
    rng = np.random.default_rng(4)
    data = _random_fastq(rng, 120, b"ACGT", 40, 40)
    assert _roundtrip(data) == data


def test_full_quality_range_roundtrip():
    # every printable quality byte 33..126 (offset auto-detect -> 33)
    rng = np.random.default_rng(5)
    data = _random_fastq(rng, 150, b"ACGT", 33, 126)
    assert _roundtrip(data, quality_compression_level=2) == data


def test_single_record():
    data = b"@only\nACGTN\n+\nIIIII\n"
    assert _roundtrip(data) == data


def test_many_tiny_records():
    rng = np.random.default_rng(6)
    data = _random_fastq(rng, 400, b"ACGT", 35, 45, max_len=4)
    assert _roundtrip(data, dna_compression_level=1,
                      quality_compression_level=1) == data
