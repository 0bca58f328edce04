"""Host-side (de)serialization of device-coded rANS streams.

A coded stream is (payload [L, W] u16 words, nwords [L], states [L] u32) plus
the symbol count n.  On disk it becomes:

    varint n; varint num_lanes; [L] u32 states; pack_ints nwords;
    concatenated u16-LE payload words (lane-major).

Bulk bytes stay numpy; only tiny control fields go through BitWriter.
Counterpart of the reference's per-stream BitMemory blobs
(BlockCompressor.cpp:223-259).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..utils.bitio import BitReader, BitWriter
from ..utils.npbits import np_pack_fixed, np_unpack_fixed


def _payload_tail(payload, nwords: np.ndarray) -> np.ndarray:
    """Rightmost live u16 columns of a paired payload as a host array.

    For a DEVICE payload this avoids pulling the padded [L, Wp] array over
    the host link: the pair axis is flipped on device (one cheap lax.rev),
    only ceil(max_words/2)+1 leading pairs are transferred, and the host
    un-flips them.  Returns u16 [L, 2*wkeep] equal to the rightmost columns
    of the canonical layout (2*wkeep >= max(nwords))."""
    wp = payload.shape[1]
    wkeep = min(wp, (int(nwords.max()) // 2 + 1 + 63) // 64 * 64)
    if isinstance(payload, np.ndarray):
        tail_pairs = payload[:, wp - wkeep:]
    else:
        import jax
        import jax.numpy as jnp
        flipped = jax.jit(lambda x: x[:, ::-1])(payload)
        tail_pairs = np.asarray(flipped[:, :wkeep])[:, ::-1]
    u16 = np.ascontiguousarray(tail_pairs.astype("<i4")).view("<u2") \
        .reshape(payload.shape[0], -1)
    return u16


def serialize_rans(w: BitWriter, n: int, payload, nwords, states) -> None:
    nwords = np.asarray(nwords)
    states = np.asarray(states)
    l = states.shape[0]
    w.put_varint(int(n))
    w.put_varint(l)
    if n == 0:
        return
    w.put_bytes(states.astype("<u4").tobytes())
    # nwords cluster tightly around the per-lane mean: min/width packing
    # (pack_ints) stores ~1 byte per lane instead of 2 — at the short-scan
    # lane counts (rpad/QUAL_GROUP lanes) this is ~0.3% of the block
    pack_ints(w, nwords.astype(np.int64))
    # compact payload rows: payload is the paired i32 layout; a little-endian
    # u16 view recovers the word-slot matrix, where row j's words sit
    # RIGHT-aligned at [2*Wp - nwords[j], 2*Wp) in decode order
    u16 = _payload_tail(payload, nwords)
    cols = np.arange(u16.shape[1])[None, :]
    w.put_bytes(u16[cols >= (u16.shape[1] - nwords[:, None])].tobytes())


def deserialize_rans(r: BitReader) -> Tuple[int, np.ndarray, np.ndarray,
                                            np.ndarray]:
    """Returns (n, payload [L, W], states [L] u32, nwords [L])."""
    n = r.get_varint()
    l = r.get_varint()
    if n == 0:
        return 0, np.zeros((l, 1), np.int32), \
            np.zeros((l,), np.uint32), np.zeros((l,), np.int32)
    states = np.frombuffer(r.get_bytes(4 * l), dtype="<u4").astype(np.uint32)
    nwords = unpack_ints(r).astype(np.int32)
    if len(nwords) != l or (nwords < 0).any():
        raise ValueError("rANS stream: bad lane word counts")
    total_words = int(nwords.sum())
    flat = np.frombuffer(r.get_bytes(2 * total_words), dtype="<u2")
    wmax = int(nwords.max()) if l else 0
    wmax = max(2, wmax + (wmax & 1))                  # even u16 capacity
    u16 = np.zeros((l, wmax), "<u2")
    u16[np.arange(wmax)[None, :] < nwords[:, None]] = flat
    # little-endian u16 pairs -> the paired i32 layout (words LEFT-aligned,
    # so decoders start at word pointer 0)
    payload = u16.view("<u4").view(np.int32)
    return n, payload, states, nwords


def pack_ints(w: BitWriter, vals: np.ndarray) -> None:
    """Bit-packed (count, min, width, payload) integer vector — the
    reference's bit_length(max-min) trick for varying lengths
    (BlockCompressor.cpp:458-488).  Width 0 = all values equal vmin.
    Negative values allowed (min is zigzag-coded)."""
    vals = np.asarray(vals, np.int64)
    n = len(vals)
    w.put_varint(n)
    if n == 0:
        return
    vmin, vmax = int(vals.min()), int(vals.max())
    w.put_svarint(vmin)
    width = int(vmax - vmin).bit_length()
    w.put_byte(width)
    if width == 0:
        return
    w.put_bytes(np_pack_fixed((vals - vmin).astype(np.uint64), width))


def unpack_ints(r: BitReader) -> np.ndarray:
    n = r.get_varint()
    if n == 0:
        return np.zeros(0, np.int64)
    vmin = r.get_svarint()
    width = r.get_byte()
    if width == 0:
        return np.full(n, vmin, np.int64)
    nbytes = (n * width + 7) // 8
    raw = np.frombuffer(r.get_bytes(nbytes), np.uint8)
    return np_unpack_fixed(raw, n, width) + vmin
