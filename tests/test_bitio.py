import numpy as np
import pytest

from dsrc_tpu.utils.bitio import BitReader, BitWriter
from dsrc_tpu.utils.crc32 import crc32, crc32_reference


def test_bitio_roundtrip_mixed():
    w = BitWriter()
    w.put_bits(0b101, 3)
    w.put_bit(1)
    w.put_byte(0xAB)
    w.put_uint32(123456789)
    w.put_varint(0)
    w.put_varint(300)
    w.put_varint(2**40 + 17)
    w.put_bytes(b"hello")
    w.put_uint64(2**63 + 5)
    data = w.getvalue()

    r = BitReader(data)
    assert r.get_bits(3) == 0b101
    assert r.get_bit() == 1
    assert r.get_byte() == 0xAB
    assert r.get_uint32() == 123456789
    assert r.get_varint() == 0
    assert r.get_varint() == 300
    assert r.get_varint() == 2**40 + 17
    assert r.get_bytes(5) == b"hello"
    assert r.get_uint64() == 2**63 + 5


def test_bitio_random_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(20):
        ops = []
        w = BitWriter()
        for _ in range(50):
            n = int(rng.integers(1, 33))
            v = int(rng.integers(0, 2**n))
            ops.append((n, v))
            w.put_bits(v, n)
        data = w.getvalue()
        r = BitReader(data)
        for n, v in ops:
            assert r.get_bits(n) == v


def test_crc32_matches_reference_model():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes()
    assert crc32(data) == crc32_reference(data)
    # chaining
    c1 = crc32(data[:500])
    assert crc32(data[500:], c1) == crc32(data)
