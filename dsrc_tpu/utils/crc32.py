"""CRC32 (poly 0xEDB88320, LSB-first, seed 0xFFFFFFFF).

Same polynomial/convention as the reference Crc32Hasher (Crc32.h:24-76) and
zlib — so ``crc32(data)`` matches ``zlib.crc32(data)``.  We use zlib's C
implementation (baked into CPython) for speed; a pure-numpy table fallback is
kept for documentation/verification.
"""
from __future__ import annotations

import zlib

import numpy as np


def crc32(data, seed: int = 0) -> int:
    """CRC32 of bytes / numpy uint8 array; chainable via ``seed``."""
    if isinstance(data, np.ndarray):
        data = data.tobytes()
    return zlib.crc32(data, seed) & 0xFFFFFFFF


def _make_table() -> np.ndarray:
    table = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = np.uint32(0xEDB88320) ^ (c >> np.uint32(1)) if (c & 1) \
                else (c >> np.uint32(1))
        table[i] = c
    return table


_TABLE = _make_table()


def crc32_reference(data: bytes, seed: int = 0) -> int:
    """Bitwise-identical scalar model of the reference Crc32Hasher."""
    crc = np.uint32(seed ^ 0xFFFFFFFF)
    for b in data:
        crc = _TABLE[(crc ^ np.uint32(b)) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))
