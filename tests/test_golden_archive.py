"""Golden-archive freeze: archives written by the round-5 build are
checked into tests/data and must decode byte-exactly FOREVER.  Any change
to decode semantics that breaks an existing archive fails here, forcing a
deliberate archive-version bump instead of silent breakage (VERDICT r4
#6; reference analogue: the self-describing container,
DsrcFile.cpp:133-170)."""
import io
import os

import pytest

from dsrc_tpu.api import DsrcModule
from dsrc_tpu.config import InputParameters

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

FIXTURES = [
    ("golden_uniform", dict()),              # fixed-width Illumina, -d0 -q0
    ("golden_semi", dict()),                 # variable titles (mode 2)
    ("golden_generic", dict(dna_compression_level=2,
                            quality_compression_level=2)),  # order-k ctx
    ("golden_lossy", dict(lossy_quality=True,
                          quality_compression_level=1)),
]


@pytest.mark.parametrize("name,kw", FIXTURES)
def test_golden_archive_decodes_forever(name, kw):
    fq = os.path.join(DATA, name + ".fastq")
    xz = os.path.join(DATA, name + ".xfqz")
    assert os.path.exists(fq) and os.path.exists(xz), (
        f"golden fixture {name} missing — regenerate with "
        f"tools/make_golden.py ONLY alongside an archive VERSION bump")
    expect = open(fq, "rb").read()
    out = io.BytesIO()
    DsrcModule().decompress(xz, out)
    assert out.getvalue() == expect, (
        f"golden archive {name} no longer decodes byte-exactly — decode "
        f"semantics changed; bump the archive VERSION and regenerate")


@pytest.mark.parametrize("name,kw", FIXTURES)
def test_golden_inputs_still_roundtrip(name, kw):
    """The current encoder may produce different bytes than the golden
    archive (tuning is free to change the encoding) but must still
    round-trip the same inputs."""
    fq = os.path.join(DATA, name + ".fastq")
    data = open(fq, "rb").read()
    mod = DsrcModule(InputParameters(fastq_block_size_bytes=1 << 17, **kw))
    arch = io.BytesIO()
    mod.compress(io.BytesIO(data), arch)
    arch.seek(0)
    out = io.BytesIO()
    mod.decompress(arch, out)
    if kw.get("lossy_quality"):
        # lossy: sequences/titles preserved; quality binned
        a = out.getvalue().split(b"\n")[0::4]
        b = data.split(b"\n")[0::4]
        assert a == b
    else:
        assert out.getvalue() == data
