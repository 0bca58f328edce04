import io

import jax.numpy as jnp
import numpy as np
import pytest

from dsrc_tpu.io.chunker import FastqChunker
from dsrc_tpu.ops import parser
from dsrc_tpu.utils.synth import make_fastq

CAP = 1 << 16
MAXR = 256


def _pad(data: bytes):
    arr = np.zeros(CAP, dtype=np.uint8)
    raw = np.frombuffer(data, dtype=np.uint8)
    arr[:len(raw)] = raw
    return jnp.asarray(arr), jnp.int32(len(raw))


def _records_of(data: bytes):
    lines = data.decode().strip("\n").split("\n")
    return [lines[i:i + 4] for i in range(0, len(lines), 4)]


def test_parse_block_fields():
    data = make_fastq(20, 50, seed=1)
    arr, n = _pad(data)
    p = parser.parse_block(arr, n, MAXR)
    recs = _records_of(data)
    assert int(p.num_records) == 20
    assert bool(p.valid)
    for r, (t, s, pl, q) in enumerate(recs):
        ts, tl = int(p.title_start[r]), int(p.title_len[r])
        assert data[ts:ts + tl].decode() == t[1:]
        ss, sl = int(p.seq_start[r]), int(p.seq_len[r])
        assert data[ss:ss + sl].decode() == s
        qs, ql = int(p.qual_start[r]), int(p.qual_len[r])
        assert data[qs:qs + ql].decode() == q
        assert int(p.plus_len[r]) == len(pl) - 1


def test_parse_block_crlf_and_varlen():
    data = make_fastq(10, 40, variable_length=True, seed=2,
                      line_sep=b"\r\n")
    arr, n = _pad(data)
    p = parser.parse_block(arr, n, MAXR)
    assert bool(p.valid)
    recs = _records_of(data.replace(b"\r\n", b"\n"))
    for r, (t, s, pl, q) in enumerate(recs):
        sl = int(p.seq_len[r])
        assert sl == len(s)
        ss = int(p.seq_start[r])
        assert data[ss:ss + sl].decode() == s


def test_parse_block_invalid():
    arr, n = _pad(b"@a\nACGT\nX\nIIII\n")  # bad plus line
    p = parser.parse_block(arr, n, MAXR)
    assert not bool(p.valid)


def test_gather_scatter_stream_roundtrip():
    data = make_fastq(15, 30, variable_length=True, seed=3)
    arr, n = _pad(data)
    p = parser.parse_block(arr, n, MAXR)
    stream, total, offsets = parser.gather_stream(
        arr, p.seq_start, p.seq_len, CAP)
    recs = _records_of(data)
    cat = "".join(s for _, s, _, _ in recs).encode()
    assert int(total) == len(cat)
    assert bytes(np.asarray(stream[:int(total)])) == cat
    # scatter back to original positions
    back = parser.scatter_stream(stream, offsets, p.seq_len, p.seq_start, CAP)
    back = np.asarray(back)
    orig = np.asarray(arr)
    mask = np.zeros(CAP, bool)
    for r in range(15):
        s, l = int(p.seq_start[r]), int(p.seq_len[r])
        mask[s:s + l] = True
    np.testing.assert_array_equal(back[mask], orig[mask])
    assert (back[~mask] == 0).all()


def test_analyze_block():
    data = make_fastq(30, 40, quality_offset=64, seed=4)
    arr, n = _pad(data)
    p = parser.parse_block(arr, n, MAXR)
    info = parser.analyze_block(arr, p)
    assert int(info["quality_offset"]) == 64
    assert not bool(info["color_space"])
    assert not bool(info["plus_repetition"])

    data = make_fastq(30, 40, color_space=True, plus_repetition=True, seed=5)
    arr, n = _pad(data)
    p = parser.parse_block(arr, n, MAXR)
    info = parser.analyze_block(arr, p)
    assert bool(info["color_space"])
    assert bool(info["plus_repetition"])
    assert int(info["quality_offset"]) == 33


@pytest.mark.parametrize("block_size", [1 << 16, 1 << 18])
def test_chunker_alignment(block_size):
    data = make_fastq(5000, 60, variable_length=True, seed=6)
    chunks = list(FastqChunker(io.BytesIO(data), block_size))
    joined = b"".join(bytes(c) for c in chunks)
    assert joined == data
    for c in chunks:
        assert c[-1] == 10
        assert np.count_nonzero(c == 10) % 4 == 0


def test_chunker_no_trailing_newline():
    data = make_fastq(10, 30, seed=7)[:-1]
    chunks = list(FastqChunker(io.BytesIO(data), 1 << 16))
    assert b"".join(bytes(c) for c in chunks) == data + b"\n"
