"""CLI flag parsing + end-to-end CLI round-trip."""
import io
import subprocess
import sys

import pytest

from dsrc_tpu.cli import parse_args
from dsrc_tpu.config import DsrcException
from dsrc_tpu.utils.synth import make_fastq, make_fastq_fast


def test_parse_basic():
    mode, p, i, o = parse_args(["c", "-d2", "-q1", "-b16", "-c", "-l",
                                "in.fq", "out.xfqz"])
    assert mode == "c" and i == "in.fq" and o == "out.xfqz"
    assert p.dna_compression_level == 2
    assert p.quality_compression_level == 1
    assert p.fastq_block_size_mb == 16
    assert p.calculate_crc32 and p.lossy_quality


def test_parse_preset_and_fields():
    _, p, _, _ = parse_args(["c", "-m1", "-f1,3", "a", "b"])
    assert p.dna_compression_level == 2
    assert p.fastq_block_size_mb == 64
    assert p.tag_preserve_mask == 0b101


def test_parse_stdio():
    mode, p, i, o = parse_args(["c", "-s", "out.xfqz"])
    assert p.use_stdio and i is None and o == "out.xfqz"
    mode, p, i, o = parse_args(["d", "-s", "in.xfqz"])
    assert p.use_stdio and i == "in.xfqz" and o is None


def test_parse_errors():
    for argv in (["x", "a", "b"], ["c", "-d9", "a", "b"], ["c", "a"],
                 ["c", "-zz", "a", "b"]):
        with pytest.raises(DsrcException):
            parse_args(argv)


def test_cli_roundtrip(tmp_path):
    data = make_fastq(300, 60, seed=21)
    fin = tmp_path / "in.fastq"
    fin.write_bytes(data)
    arch = tmp_path / "out.xfqz"
    out = tmp_path / "rt.fastq"
    from dsrc_tpu.cli import main
    assert main(["c", "-d1", "-q1", str(fin), str(arch)]) == 0
    assert main(["d", str(arch), str(out)]) == 0
    assert out.read_bytes() == data


def test_fast_synth_is_valid_fastq():
    data = make_fastq_fast(500, 100, seed=3)
    lines = data.split(b"\n")
    assert lines[-1] == b""
    lines = lines[:-1]
    assert len(lines) == 2000
    assert all(l.startswith(b"@SIM001.") for l in lines[0::4])
    assert all(len(l) == 100 for l in lines[1::4])
    assert all(l == b"+" for l in lines[2::4])
    assert all(len(l) == 100 for l in lines[3::4])


def test_cli_record_range(tmp_path):
    from dsrc_tpu.cli import main
    from dsrc_tpu.utils.synth import make_fastq
    data = make_fastq(500, 60, seed=9)
    fin = tmp_path / "in.fastq"
    fin.write_bytes(data)
    arch = tmp_path / "a.xfqz"
    out = tmp_path / "slice.fastq"
    assert main(["c", "-b1", str(fin), str(arch)]) == 0
    assert main(["d", "-r10:20", str(arch), str(out)]) == 0
    lines = data.decode().splitlines(keepends=True)
    want = "".join(lines[40:80]).encode()
    assert out.read_bytes() == want
