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


def _ref_roundtrip(ref_bin, data: bytes, tmp, mode: int) -> tuple:
    fin = tmp / "in.fastq"
    fin.write_bytes(data)
    arch = tmp / "a.dsrc"
    out = tmp / "o.fastq"
    subprocess.run([str(ref_bin), "c", f"-m{mode}", "-t2",
                    str(fin), str(arch)], check=True, capture_output=True)
    subprocess.run([str(ref_bin), "d", "-t2", str(arch), str(out)],
                   check=True, capture_output=True)
    return out.read_bytes(), arch.stat().st_size


def _our_roundtrip(data: bytes, mode: int) -> tuple:
    p = InputParameters.preset(mode)
    p.fastq_block_size_bytes = 1 << 20
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
