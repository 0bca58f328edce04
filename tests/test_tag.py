"""Tag tokenizer scheme zoo: round-trips + scheme selection checks
(reference TagModeler.cpp:461-551 capability set)."""
import numpy as np
import pytest

from dsrc_tpu.models import tag as TAG
from dsrc_tpu.utils.bitio import BitReader, BitWriter

CAP = 65536
FULL = 0xFFFFFFFFFFFFFFFF


def roundtrip(titles, preserve=FULL):
    data = np.frombuffer(b"".join(titles), np.uint8)
    lens = np.array([len(t) for t in titles], np.int64)
    w = BitWriter()
    TAG.encode_tags(w, data, lens, preserve, CAP)
    r = BitReader(w.getvalue())
    out, out_lens = TAG.decode_tags(r, len(titles), CAP)
    got = []
    off = 0
    for ln in out_lens:
        got.append(out[off: off + int(ln)].tobytes())
        off += int(ln)
    return got, len(w.getvalue())


def test_incrementing_counter_titles():
    titles = [f"SRR001.{i} len=100".encode() for i in range(1, 400)]
    got, nbytes = roundtrip(titles)
    assert got == titles
    # delta-const counter + const fields: a few bytes total
    assert nbytes < 200


def test_zero_padded_counter_is_numeric():
    titles = [f"SIM001.{i:09d} X".encode() for i in range(1, 300)]
    got, nbytes = roundtrip(titles)
    assert got == titles
    assert nbytes < 200      # FS_NUM_DELTA_CONST with pad flag


def test_value_rle_scheme():
    # long runs of identical values -> RLE beats value packing
    vals = np.repeat(np.arange(40) * 977, 50)
    titles = [f"R:{v}:tail".encode() for v in vals]
    got, nbytes = roundtrip(titles)
    assert got == titles
    assert nbytes < 1200


def test_dict_scheme_small_value_set():
    rng = np.random.default_rng(0)
    vals = rng.choice([5, 1009, 777777, 42], size=600)
    titles = [f"lane:{v} q".encode() for v in vals]
    got, nbytes = roundtrip(titles)
    assert got == titles
    # 4 distinct values -> 2 bits each + dict, far below 20-bit packing
    assert nbytes < 600 * 2


def test_mixed_formatting_exceptions():
    titles = [f"AB.{i} x:{i%7}".encode() for i in range(500)]
    titles[17] = b"weird title without structure!!"
    titles[333] = b""
    got, _ = roundtrip(titles)
    assert got == titles


def test_mixed_majority_raw_fallback():
    rng = np.random.default_rng(1)
    titles = [bytes(rng.integers(33, 126, rng.integers(3, 30)).astype(
        np.uint8)) for _ in range(100)]
    got, _ = roundtrip(titles)
    assert got == titles


def test_text_delta_coherent_field():
    # field text nearly identical across records -> vertical delta picked
    titles = [f"CHAN{'A' * 20}{chr(65 + i % 3)} {i}".encode()
              for i in range(300)]
    got, _ = roundtrip(titles)
    assert got == titles


def test_text_delta_bwd_matches_fwd():
    rng = np.random.default_rng(2)
    for _ in range(20):
        R = int(rng.integers(1, 40))
        tlen = rng.integers(0, 12, R).astype(np.int64)
        field = rng.integers(0, 256, int(tlen.sum())).astype(np.uint8)
        d = TAG._text_delta_fwd(field, tlen)
        b = TAG._text_delta_bwd(d.astype(np.int64), tlen)
        np.testing.assert_array_equal(b, field)


def test_field_filtering_still_works():
    titles = [f"keep.{i} drop:{i*3}".encode() for i in range(100)]
    # preserve fields 1,2 (1-based): "keep", "i"; each kept token keeps its
    # trailing separator (reference FastqParserExt rule)
    mask = (1 << 0) | (1 << 1)
    got, _ = roundtrip(titles, preserve=mask)
    assert got == [f"keep.{i} ".encode() for i in range(100)]


def test_single_record():
    got, _ = roundtrip([b"only.1 one:record"])
    assert got == [b"only.1 one:record"]


def test_trailing_separator_empty_token():
    titles = [f"a.{i}.".encode() for i in range(50)]
    got, _ = roundtrip(titles)
    assert got == titles
