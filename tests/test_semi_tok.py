"""Semi-uniform title mode 2: host tokenization (constant + numeric
fields) with device value-delta byte-plane coding — the TagModeler numeric
schemes (TagModeler.cpp:461-551) as columns of the fused positional rANS
program."""
import io

import numpy as np

from dsrc_tpu.api import DsrcModule
from dsrc_tpu.config import InputParameters
from dsrc_tpu.io.archive import ArchiveReader
from dsrc_tpu.models import tag as TAG
from dsrc_tpu.models.block import BLOCK_SEMI
from dsrc_tpu.utils.synth import make_fastq_fast


def _analyze(titles):
    stream = np.frombuffer(b"".join(titles), np.uint8)
    lens = np.array([len(t) for t in titles], np.int64)
    return TAG.analyze_value_fields(stream, lens), stream, lens


def test_analyze_and_render_roundtrip():
    titles = [b"SIM001.1 INSTR:2:1:1007:2013 length=40",
              b"SIM001.2 INSTR:3:2:1014:2026 length=40",
              b"SIM001.10 INSTR:4:3:999:2039 length=40",
              b"SIM001.11 INSTR:1:4:1028:2052 length=40"]
    res, stream, lens = _analyze(titles)
    assert res is not None
    vmat, meta = res
    out, ol = TAG.render_value_titles(vmat, meta, 4)
    assert out.tobytes() == b"".join(titles)
    assert (ol == lens).all()


def test_analyze_zero_padded_and_rejections():
    res, _, _ = _analyze([b"RUN 0012 x", b"RUN 0345 x", b"RUN 9999 x"])
    assert res is not None
    vmat, meta = res
    assert [s for s, _ in meta[2]] == [TAG.TOKF_CONST, TAG.TOKF_NUM_PAD,
                                       TAG.TOKF_CONST]
    out, _ = TAG.render_value_titles(vmat, meta, 3)
    assert out.tobytes() == b"RUN 0012 xRUN 0345 xRUN 9999 x"
    # free-text field -> None (host tag coder path)
    assert _analyze([b"a.foo", b"a.bar", b"a.baz"])[0] is None
    # > 9 digits -> None
    assert _analyze([b"r.1234567890", b"r.1234567891"])[0] is None


def test_semi_mode2_archive_roundtrip_and_scheme():
    data = make_fastq_fast((2 << 20) // 250, 100, seed=7, fixed_width=False)
    mod = DsrcModule(InputParameters(fastq_block_size_mb=1))
    arch = io.BytesIO()
    info = mod.compress(io.BytesIO(data), arch)
    arch.seek(0)
    rd = ArchiveReader(arch)
    b0 = rd.read_block(0)
    assert b0[0] == BLOCK_SEMI
    arch.seek(0)
    out = io.BytesIO()
    mod.decompress(arch, out)
    assert out.getvalue() == data
    # the device value path must beat ~1 byte/record on these titles
    # (the host tag coder measured ~0.3 B/rec; positional char coding ~6)
    nrec = data.count(b"\n") // 4
    assert info.comp["tag"] < nrec, info.comp["tag"]


def test_semi_mode0_fallback_on_text_fields():
    recs = []
    for i in range(600):
        recs.append(f"@x{'ab'[i % 2]}q.{i} z{i % 3}w\n"
                    f"ACGTACGTAC\n+\nIIIIHHHHGG\n")
    data = "".join(recs).encode()
    mod = DsrcModule(InputParameters(fastq_block_size_bytes=16384))
    arch = io.BytesIO()
    mod.compress(io.BytesIO(data), arch)
    arch.seek(0)
    out = io.BytesIO()
    mod.decompress(arch, out)
    assert out.getvalue() == data


def test_semi_compressed_bytes_scheduling_deterministic():
    """Compressed archives must not depend on worker scheduling: the semi
    lane/plane hints are frozen after the first (synchronous) block, so a
    1-worker and a 4-worker run produce byte-identical archives."""
    data = make_fastq_fast(6000, 80, seed=13, fixed_width=False)
    outs = []
    for workers in (1, 4):
        mod = DsrcModule(InputParameters(fastq_block_size_bytes=1 << 18,
                                         num_workers=workers))
        arch = io.BytesIO()
        mod.compress(io.BytesIO(data), arch)
        outs.append(arch.getvalue())
    assert outs[0] == outs[1]


def test_realistic_synth_roundtrips():
    """The measured-realism generator (AR(1)-correlated quality, Markov
    DNA, real Illumina 7-field titles, N bursts, adapters) round-trips on
    the semi path at every level combo we ship presets for."""
    from dsrc_tpu.utils.synth import make_fastq_realistic
    data = make_fastq_realistic(3000, 100, seed=3)
    for d, q in ((0, 0), (2, 2)):
        mod = DsrcModule(InputParameters(
            dna_compression_level=d, quality_compression_level=q,
            fastq_block_size_bytes=1 << 19))
        arch = io.BytesIO()
        mod.compress(io.BytesIO(data), arch)
        arch.seek(0)
        out = io.BytesIO()
        mod.decompress(arch, out)
        assert out.getvalue() == data, (d, q)
    nova = make_fastq_realistic(3000, 100, seed=4, platform="novaseq")
    mod = DsrcModule(InputParameters(fastq_block_size_bytes=1 << 19))
    arch = io.BytesIO()
    mod.compress(io.BytesIO(nova), arch)
    arch.seek(0)
    out = io.BytesIO()
    mod.decompress(arch, out)
    assert out.getvalue() == nova
