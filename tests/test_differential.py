"""Differential tests vs the reference DSRC binary (SURVEY.md §4: golden
round-trip equality per behavior class + ratio sanity).

The reference is built on demand from /root/reference into a temp dir
(never writing to the reference tree).  Skipped when the reference sources
or a C++ toolchain are unavailable.
"""
import io
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from dsrc_tpu.api import DsrcModule
from dsrc_tpu.config import InputParameters
from dsrc_tpu.utils.synth import make_fastq

REF_SRC = Path("/root/reference")
BUILD = Path("/tmp/refbuild")


@pytest.fixture(scope="module")
def ref_bin():
    binary = BUILD / "bin" / "dsrc"
    if binary.exists():
        return binary
    if not REF_SRC.exists() or shutil.which("g++") is None:
        pytest.skip("reference sources or g++ unavailable")
    shutil.copytree(REF_SRC, BUILD, dirs_exist_ok=True)
    r = subprocess.run(["make", "-f", "Makefile.c++11", "bin"], cwd=BUILD,
                       capture_output=True, timeout=600)
    if r.returncode != 0 or not binary.exists():
        pytest.skip(f"reference build failed: {r.stderr[-300:]}")
    return binary


def _ref_roundtrip(ref_bin, data: bytes, tmp, mode: int,
                   extra=()) -> tuple:
    fin = tmp / "in.fastq"
    fin.write_bytes(data)
    arch = tmp / "a.dsrc"
    out = tmp / "o.fastq"
    subprocess.run([str(ref_bin), "c", f"-m{mode}", "-t2", *extra,
                    str(fin), str(arch)], check=True, capture_output=True)
    subprocess.run([str(ref_bin), "d", "-t2", str(arch), str(out)],
                   check=True, capture_output=True)
    return out.read_bytes(), arch.stat().st_size


def _our_roundtrip(data: bytes, mode: int, lossy: bool = False) -> tuple:
    p = InputParameters.preset(mode)
    p.fastq_block_size_bytes = 1 << 20
    if lossy:
        p.lossy_quality = True
    m = DsrcModule(p)
    arch = io.BytesIO()
    m.compress(io.BytesIO(data), arch)
    arch.seek(0)
    out = io.BytesIO()
    m.decompress(arch, out)
    return out.getvalue(), arch.getbuffer().nbytes


@pytest.mark.parametrize("mode", [0, 1])
def test_differential_illumina(ref_bin, tmp_path, mode):
    data = make_fastq(1200, 100, seed=40 + mode)
    ref_out, ref_size = _ref_roundtrip(ref_bin, data, tmp_path, mode)
    our_out, our_size = _our_roundtrip(data, mode)
    # both engines must reproduce the input byte-exactly
    assert ref_out == data
    assert our_out == data
    # ratio parity: within 25% of the reference archive size
    assert our_size < ref_size * 1.25, (our_size, ref_size)


def test_differential_454_variable(ref_bin, tmp_path):
    data = make_fastq(600, 200, variable_length=True,
                      title_style="sra454", seed=50)
    ref_out, ref_size = _ref_roundtrip(ref_bin, data, tmp_path, 0)
    our_out, our_size = _our_roundtrip(data, 0)
    assert ref_out == data
    assert our_out == data
    assert our_size < ref_size * 1.3, (our_size, ref_size)


def test_differential_m2_high_mode(ref_bin, tmp_path):
    """-m2 = -d3 -q2 -b256: the reference's strongest models
    (DnaModelerRCO order 9 path, QualityOrderModeler; main.cpp:195-219)."""
    data = make_fastq(1500, 100, seed=60)
    ref_out, ref_size = _ref_roundtrip(ref_bin, data, tmp_path, 2)
    our_out, our_size = _our_roundtrip(data, 2)
    assert ref_out == data
    assert our_out == data
    assert our_size < ref_size * 1.25, (our_size, ref_size)


def test_differential_m2_454(ref_bin, tmp_path):
    data = make_fastq(500, 180, variable_length=True,
                      title_style="sra454", seed=61)
    ref_out, ref_size = _ref_roundtrip(ref_bin, data, tmp_path, 2)
    our_out, our_size = _our_roundtrip(data, 2)
    assert ref_out == data
    assert our_out == data
    assert our_size < ref_size * 1.3, (our_size, ref_size)


def test_differential_lossy_binning(ref_bin, tmp_path):
    """Lossy Illumina binning: both engines quantize with the same 8-bin
    table (RecordsProcessor.cpp:318-342 <-> ops/transform.py), so their
    DECOMPRESSED outputs must agree with each other byte-for-byte."""
    data = make_fastq(800, 100, seed=62)
    ref_out, _ = _ref_roundtrip(ref_bin, data, tmp_path, 1, extra=("-l",))
    our_out, _ = _our_roundtrip(data, 1, lossy=True)
    assert ref_out != data          # sanity: lossy actually changed bytes
    assert our_out == ref_out


def test_differential_lossy_mode2(ref_bin, tmp_path):
    data = make_fastq(700, 90, seed=63, variable_length=True)
    ref_out, _ = _ref_roundtrip(ref_bin, data, tmp_path, 2, extra=("-l",))
    our_out, _ = _our_roundtrip(data, 2, lossy=True)
    assert our_out == ref_out


@pytest.mark.parametrize("mode", [0, 2])
def test_solid_color_space_roundtrip(ref_bin, tmp_path, mode):
    """SOLiD color space: OUR engine must round-trip byte-exactly.  The
    reference binary does NOT (it decompresses synthetic SOLiD to blank
    sequence lines — verified r1, BASELINE.md), so no byte comparison
    against it is possible; we only check it accepts the input."""
    data = make_fastq(400, 50, color_space=True, seed=64)
    our_out, _ = _our_roundtrip(data, mode)
    assert our_out == data
    try:
        ref_out, _ = _ref_roundtrip(ref_bin, data, tmp_path, mode)
        assert ref_out != data     # documents the reference defect
    except subprocess.CalledProcessError:
        pass                        # reference rejecting it is also fine


def test_differential_iupac_and_plus_repetition(ref_bin, tmp_path):
    """Low-quality IUPAC ambiguity codes (the reference's folding path,
    RecordsProcessor.cpp:230-243) + '+title' repetition lines
    (README.md:5-13 feature list)."""
    data = make_fastq(500, 80, seed=65, plus_repetition=True,
                      iupac_prob=0.004)
    ref_out, ref_size = _ref_roundtrip(ref_bin, data, tmp_path, 1)
    our_out, our_size = _our_roundtrip(data, 1)
    assert ref_out == data
    assert our_out == data
    assert our_size < ref_size * 1.35, (our_size, ref_size)


def test_iupac_high_quality_reference_defect(ref_bin, tmp_path):
    """IUPAC codes at quality >= 7 go through the DNA stream itself.  The
    reference binary CORRUPTS them in every mode (verified r2: 'TH'->'NN'
    then desync); we round-trip byte-exactly."""
    rng = np.random.default_rng(7)
    data = bytearray(make_fastq(400, 60, seed=71))
    lines = bytes(data).split(b"\n")
    iu = b"RWSKMDVHBY"
    for i in range(0, len(lines) - 3, 4):
        seq = bytearray(lines[i + 1])
        for j in range(len(seq)):
            if rng.random() < 0.01:
                seq[j] = iu[int(rng.integers(0, len(iu)))]
        lines[i + 1] = bytes(seq)
    data = b"\n".join(lines)
    our_out, _ = _our_roundtrip(data, 1)
    assert our_out == data
    ref_out, _ = _ref_roundtrip(ref_bin, data, tmp_path, 1)
    assert ref_out != data      # documents the reference defect
