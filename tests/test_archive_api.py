"""Record-at-a-time archive API + FastqFile + pipeline + native bindings."""
import io

import numpy as np
import pytest

from dsrc_tpu.archive_api import DsrcArchive, FastqFile, FastqRecord
from dsrc_tpu.config import DsrcException, InputParameters
from dsrc_tpu.parallel.pipeline import ordered_parallel_map
from dsrc_tpu.utils import native
from dsrc_tpu.utils.synth import make_fastq


def test_record_archive_roundtrip():
    params = InputParameters(fastq_block_size_bytes=32768,
                             dna_compression_level=1,
                             quality_compression_level=1)
    arch = io.BytesIO()
    a = DsrcArchive(params)
    a.start_compress(arch)
    recs = []
    for i in range(300):
        r = FastqRecord(tag=f"read.{i} x:{i%7}", sequence="ACGTAC" * 10,
                        quality="IIIHHGGFFE" * 6)
        recs.append(r)
        a.write_next_record(r)
    a.finish_compress()

    arch.seek(0)
    b = DsrcArchive()
    b.start_decompress(arch)
    got = []
    while True:
        r = b.read_next_record()
        if r is None:
            break
        got.append(r)
    b.finish_decompress()
    assert len(got) == 300
    assert all(g == r for g, r in zip(got, recs))


def test_record_archive_context_manager_flushes_small_session():
    """Regression (ADVICE r1, high): a `with` session smaller than one block
    exited without writing anything because the ArchiveWriter is created
    lazily on the first flush."""
    arch = io.BytesIO()
    recs = [FastqRecord(tag=f"r{i}", sequence="ACGT" * 8, quality="IIHH" * 8)
            for i in range(5)]
    with DsrcArchive() as a:           # default 8 MB block >> 5 records
        a.start_compress(arch)
        for r in recs:
            a.write_next_record(r)
    assert arch.tell() > 0, "buffered tail was not flushed on __exit__"
    arch.seek(0)
    with DsrcArchive() as b:
        b.start_decompress(arch)
        got = [b.read_next_record() for _ in range(6)]
    assert got[:5] == recs and got[5] is None


def test_record_archive_flushes_before_oversized_append():
    """Regression (ADVICE r1): a record that would push the buffer past the
    block size triggers a flush first instead of overflowing codec capacity."""
    params = InputParameters(fastq_block_size_bytes=4096)
    arch = io.BytesIO()
    long_seq = "ACGT" * 500                      # 2 KB reads
    with DsrcArchive(params) as a:
        a.start_compress(arch)
        for i in range(8):
            a.write_next_record(FastqRecord(
                tag=f"r{i}", sequence=long_seq, quality="I" * len(long_seq)))
    arch.seek(0)
    with DsrcArchive() as b:
        b.start_decompress(arch)
        n = 0
        while b.read_next_record() is not None:
            n += 1
    assert n == 8


def test_record_archive_empty_session_exits_cleanly():
    with DsrcArchive() as a:
        a.start_compress(io.BytesIO())
    # no records: __exit__ must not raise, archive stays unwritten


def test_fastq_file_read_write(tmp_path):
    data = make_fastq(25, 40, seed=1)
    p = tmp_path / "x.fastq"
    p.write_bytes(data)
    with FastqFile(str(p)) as f:
        recs = list(f)
    assert len(recs) == 25
    q = tmp_path / "y.fastq"
    with FastqFile(str(q), "w") as f:
        for r in recs:
            f.write_next_record(r)
    assert q.read_bytes() == data


def test_ordered_parallel_map_order_and_errors():
    out = list(ordered_parallel_map(iter(range(100)), lambda x: x * x, 4))
    assert out == [x * x for x in range(100)]

    def boom(x):
        if x == 5:
            raise DsrcException("boom")
        return x

    with pytest.raises(DsrcException):
        list(ordered_parallel_map(iter(range(20)), boom, 3))


def test_multithreaded_module_roundtrip():
    from dsrc_tpu.api import DsrcModule
    data = make_fastq(800, 60, seed=9)
    p = InputParameters(fastq_block_size_bytes=32768, num_workers=4)
    m = DsrcModule(p)
    arch = io.BytesIO()
    m.compress(io.BytesIO(data), arch)
    arch.seek(0)
    out = io.BytesIO()
    m.decompress(arch, out)
    assert out.getvalue() == data


def test_native_scan_matches_numpy():
    rng = np.random.default_rng(0)
    buf = rng.integers(0, 255, 100000).astype(np.uint8)
    buf[rng.integers(0, 100000, 5000)] = 10
    for lb in (0, 1, 2, 3, 7):
        nl_pos = np.flatnonzero(buf == 10)
        k = (lb + np.arange(len(nl_pos)) + 1) % 4 == 0
        hits = np.flatnonzero(k)
        expect = (len(nl_pos),
                  int(nl_pos[hits[-1]]) + 1 if len(hits) else -1)
        assert native.scan_records(buf, lb) == expect


def test_native_payload_roundtrip():
    rng = np.random.default_rng(1)
    payload = rng.integers(0, 65535, (17, 9)).astype(np.int32)
    nwords = rng.integers(0, 10, 17).astype(np.int32)
    mask = np.arange(9)[None, :] < nwords[:, None]
    flat = native.compact_payload(payload, nwords)
    np.testing.assert_array_equal(flat, payload[mask].astype(np.uint16))
    back = native.expand_payload(flat, nwords, 9)
    np.testing.assert_array_equal(back[mask], payload[mask])
    assert (back[~mask] == 0).all()


def test_record_random_access_across_blocks():
    """read_record(i) seeks through the per-block record counts in the
    archive index and decompresses only the owning block (the container
    advantage over the reference's unfilled recordsCount,
    DsrcFile.cpp:88)."""
    params = InputParameters(fastq_block_size_bytes=16384)
    arch = io.BytesIO()
    recs = []
    with DsrcArchive(params) as a:
        a.start_compress(arch)
        for i in range(400):
            r = FastqRecord(tag=f"read.{i} x:{i % 7}",
                            sequence="ACGTAC" * 10,
                            quality="IIIHHGGFFE" * 6)
            recs.append(r)
            a.write_next_record(r)
    arch.seek(0)
    b = DsrcArchive()
    b.start_decompress(arch)
    assert b.record_count == 400
    # spot seeks in arbitrary order, crossing block boundaries
    for i in (0, 399, 200, 1, 398, 57):
        assert b.read_record(i) == recs[i], f"record {i}"
    # a range spanning a block boundary
    got = list(b.read_records(150, 260))
    assert got == recs[150:260]
    with pytest.raises(DsrcException, match="out of range"):
        b.read_record(400)
    b.finish_decompress()
