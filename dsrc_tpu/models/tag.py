"""Tag (read-title) codec — tokenized field modeling, vectorized on host,
entropy-coded on device.

Capability map vs the reference TagModeler (TagModeler.cpp:159-1354):
  * tokenization on separators " ._,=:/-#" (TagModeler.cpp:161)
  * per-field schemes: constant, numeric {delta-const, value, delta},
    free text (FinalizeFieldsStats scheme zoo, TagModeler.cpp:461-551;
    our numeric variants use bit-packed min/width vectors instead of the
    reference's Huffman-over-values, same information)
  * mixed/inconsistent formatting falls back to a raw title coder
    (TagRawEncoder, TagModeler.cpp:1217-1283) — here an order-1
    byte-context rANS stream instead of order-0 Huffman
  * lossy ID-field filtering via the 1-based preserve mask
    (FastqParserExt::ParseFrom, FastqParser.cpp:198-251) — non-preserved
    tokens and their separators are dropped before encoding

Analysis is numpy-vectorized over all records at once (per-field loops only,
fields <= MAX_FIELDS); the byte payloads (raw titles / text tokens) are coded
by the shared epoch-adaptive rANS kernels.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import ctx as C
from ..ops.streams import (deserialize_rans, pack_ints, serialize_rans,
                           unpack_ints)
from ..utils.bitio import BitReader, BitWriter

SEPARATORS = b" ._,=:/-#"
_SEP_SET = np.zeros(256, bool)
for _c in SEPARATORS:
    _SEP_SET[_c] = True

MAX_FIELDS = 64          # beyond this -> raw (reference numbers fields to 64)
MAX_CONST_LEN = 128      # reference MAX_FIELD_STAT_LEN

TS_EMPTY = 0
TS_RAW = 1
TS_TOK = 2

FS_CONST = 0
FS_NUM_DELTA_CONST = 1
FS_NUM_VALUE = 2
FS_NUM_DELTA = 3
FS_TEXT = 4


class TokenTable:
    """Per-record token structure: K tokens separated by K-1 separator chars
    (a title may end in a separator: its final token is empty)."""

    def __init__(self, k: int, seps: np.ndarray, tok_start: np.ndarray,
                 tok_len: np.ndarray):
        self.k = k                    # tokens per record
        self.seps = seps              # [K-1] separator chars (record 0's)
        self.tok_start = tok_start    # [R, K] global offsets into stream
        self.tok_len = tok_len        # [R, K]


def tokenize(stream: np.ndarray, lengths: np.ndarray
             ) -> Optional[TokenTable]:
    """Split all titles at once; None if records disagree in structure."""
    R = len(lengths)
    n = int(lengths.sum())
    stream = stream[:n]
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    rec_of = np.repeat(np.arange(R, dtype=np.int64), lengths)
    is_sep = _SEP_SET[stream]
    seps_per_rec = np.zeros(R, np.int64)
    np.add.at(seps_per_rec, rec_of[is_sep], 1)
    k = int(seps_per_rec[0]) + 1 if R else 1
    if k > MAX_FIELDS or not (seps_per_rec == k - 1).all():
        return None
    if k > 1:
        sep_pos = np.flatnonzero(is_sep)                     # record-major
        sep_chars = stream[sep_pos].reshape(R, k - 1)
        if not (sep_chars == sep_chars[0]).all():
            return None
        sep_local = (sep_pos - starts[rec_of[sep_pos]]).reshape(R, k - 1)
        tok_start_l = np.zeros((R, k), np.int64)
        tok_start_l[:, 1:] = sep_local + 1
        tok_end_l = np.concatenate(
            [sep_local, lengths.reshape(-1, 1).astype(np.int64)], axis=1)
        seps = sep_chars[0]
    else:
        tok_start_l = np.zeros((R, 1), np.int64)
        tok_end_l = lengths.reshape(-1, 1).astype(np.int64)
        seps = np.zeros(0, np.uint8)
    tok_len = tok_end_l - tok_start_l
    if (tok_len < 0).any():
        return None
    return TokenTable(k, seps, tok_start_l + starts[:, None], tok_len)


def filter_fields(stream: np.ndarray, lengths: np.ndarray,
                  preserve_mask: int) -> Tuple[np.ndarray, np.ndarray]:
    """Drop tokens (and their trailing separators) whose 1-based index is not
    preserved.  Per-record, structure-independent (like FastqParserExt)."""
    R = len(lengths)
    n = int(lengths.sum())
    stream = stream[:n]
    rec_of = np.repeat(np.arange(R, dtype=np.int64), lengths)
    is_sep = _SEP_SET[stream]
    # token id of each char within its record (separators close their token)
    sep_cum = np.cumsum(is_sep)
    rec_start = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    sep_before_rec = np.concatenate(
        [[0], sep_cum]).astype(np.int64)[rec_start[rec_of]]
    tok_id = np.where(is_sep, sep_cum - 1, sep_cum) - sep_before_rec
    tok_id = np.minimum(tok_id, 63)
    keep_tok = np.array([(preserve_mask >> i) & 1 for i in range(64)], bool)
    keep = keep_tok[tok_id]
    new_stream = stream[keep]
    new_lengths = np.zeros(R, np.int64)
    np.add.at(new_lengths, rec_of[keep], 1)
    return new_stream, new_lengths


# --------------------------------------------------------------------------
# Per-field analysis
# --------------------------------------------------------------------------

def _gather_matrix(stream, start, width):
    """[R, width] byte matrix of tokens (clipped; caller masks by length)."""
    idx = start[:, None] + np.arange(width, dtype=np.int64)[None, :]
    return stream[np.minimum(idx, len(stream) - 1)]


def _numeric_values(stream, start, tlen) -> Optional[np.ndarray]:
    """int64 values if every token is a canonical decimal; else None."""
    if len(tlen) == 0 or (tlen < 1).any() or (tlen > 18).any():
        return None
    w = int(tlen.max())
    mat = _gather_matrix(stream, start, w)
    col = np.arange(w, dtype=np.int64)[None, :]
    in_tok = col < tlen[:, None]
    is_digit = (mat >= 48) & (mat <= 57)
    if not (is_digit | ~in_tok).all():
        return None
    # no leading zeros (unless the token is exactly "0")
    if ((mat[:, 0] == 48) & (tlen > 1)).any():
        return None
    vals = np.zeros(len(tlen), np.int64)
    for i in range(w):
        d = (mat[:, i] - 48).astype(np.int64)
        vals = np.where(in_tok[:, i], vals * 10 + d, vals)
    return vals


def _is_const(stream, start, tlen) -> bool:
    if len(tlen) == 0:
        return False
    L0 = int(tlen[0])
    if L0 > MAX_CONST_LEN or not (tlen == L0).all():
        return False
    if L0 == 0:
        return True
    mat = _gather_matrix(stream, start, L0)
    return bool((mat == mat[0]).all())


def _extract_field(stream, start, tlen) -> np.ndarray:
    """Concatenated bytes of one field across records (record-major)."""
    total = int(tlen.sum())
    if total == 0:
        return np.zeros(0, np.uint8)
    reps = np.repeat(np.arange(len(tlen), dtype=np.int64), tlen)
    offs = np.concatenate([[0], np.cumsum(tlen)[:-1]]).astype(np.int64)
    within = np.arange(total, dtype=np.int64) - offs[reps]
    return stream[start[reps] + within]


# --------------------------------------------------------------------------
# Device byte-stream codec (shared by raw titles and text tokens)
# --------------------------------------------------------------------------

def _code_bytes(w: BitWriter, data: np.ndarray, cap: int) -> None:
    """Order-1 byte-context rANS of a [n] uint8 array (n <= cap).  Lane
    geometry is sized to the stream (ops/ctx.py stream_cap), not the block."""
    n = len(data)
    nc = C.stream_cap(cap, n)
    num_lanes = C.pick_num_lanes(nc)
    edges = C.band_edges(nc // num_lanes)
    padded = jnp.asarray(np.pad(data.astype(np.int32), (0, nc - n)))
    enc = C.encode_orderk(padded, n, 1, 8, 256, num_lanes, edges)
    serialize_rans(w, n, enc["payload"], enc["nwords"], enc["states"])


POS_CTX_BITS = 4   # token-position context (reference per-position char
FID_CTX_BITS = 3   # histograms, TagModeler.cpp:159-459) + field id
TEXT_NUM_CTX = 1 << (POS_CTX_BITS + FID_CTX_BITS)


def _text_ctx(field_lens, text_fields) -> np.ndarray:
    """Context ids for the shared text stream: (field id & 7) << 4 |
    min(position-in-token, 15).  Derivable by the decoder from the already
    transmitted per-field token lengths."""
    parts = []
    for fk in text_fields:
        lens = np.asarray(field_lens[fk], np.int64)
        total = int(lens.sum())
        reps = np.repeat(np.arange(len(lens)), lens)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        pos = np.minimum(np.arange(total) - offs[reps],
                         (1 << POS_CTX_BITS) - 1)
        parts.append(((fk & 7) << POS_CTX_BITS) | pos)
    return (np.concatenate(parts) if parts
            else np.zeros(0, np.int64)).astype(np.int32)


def _code_text(w: BitWriter, data: np.ndarray, ctx: np.ndarray,
               cap: int) -> None:
    """Positional-context coding of the shared token text stream."""
    from .quality import _decode_ctxarr, _encode_ctxarr
    n = len(data)
    nc = C.stream_cap(cap, n)
    num_lanes = C.pick_num_lanes(nc)
    edges = C.band_edges(nc // num_lanes)
    d = jnp.asarray(np.pad(data.astype(np.int32), (0, nc - n)))
    c = jnp.asarray(np.pad(ctx[:n], (0, nc - n)))
    enc = _encode_ctxarr(d, n, c, TEXT_NUM_CTX, 256, num_lanes, edges)
    serialize_rans(w, n, enc["payload"], enc["nwords"], enc["states"])


def _decode_text(r: BitReader, ctx: np.ndarray, cap: int) -> np.ndarray:
    from .quality import _decode_ctxarr
    n, payload, states, _ = deserialize_rans(r)
    if n == 0:
        return np.zeros(0, np.uint8)
    nc = C.stream_cap(cap, n)
    num_lanes = C.pick_num_lanes(nc)
    edges = C.band_edges(nc // num_lanes)
    t_steps = nc // num_lanes
    if payload.shape[0] < num_lanes:
        payload = np.pad(payload, ((0, num_lanes - payload.shape[0]), (0, 0)))
    c = jnp.asarray(np.pad(ctx[:n].astype(np.int32), (0, nc - n)))
    dec = _decode_ctxarr(jnp.asarray(payload), jnp.asarray(states), n, c,
                         t_steps, TEXT_NUM_CTX, 256, num_lanes, edges)
    return np.asarray(dec)[:n].astype(np.uint8)


def _decode_bytes(r: BitReader, cap: int) -> np.ndarray:
    n, payload, states, _ = deserialize_rans(r)
    if n == 0:
        return np.zeros(0, np.uint8)
    nc = C.stream_cap(cap, n)
    num_lanes = C.pick_num_lanes(nc)
    edges = C.band_edges(nc // num_lanes)
    t_steps = nc // num_lanes
    if payload.shape[0] < num_lanes:
        payload = np.pad(payload, ((0, num_lanes - payload.shape[0]), (0, 0)))
    dec = C.decode_orderk(jnp.asarray(payload), jnp.asarray(states), n,
                          t_steps, 1, 8, 256, num_lanes, edges)
    return np.asarray(dec)[:n].astype(np.uint8)


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------

def encode_tags(w: BitWriter, stream: np.ndarray, lengths: np.ndarray,
                preserve_mask: int, cap: int) -> None:
    """stream: concatenated title bytes (no '@'), lengths: [R]."""
    R = len(lengths)
    if R == 0:
        w.put_byte(TS_EMPTY)
        return
    stream = np.asarray(stream, np.uint8)
    lengths = np.asarray(lengths, np.int64)
    if preserve_mask != 0xFFFFFFFFFFFFFFFF:
        stream, lengths = filter_fields(stream, lengths, preserve_mask)
    tt = tokenize(stream, lengths)
    if tt is None:
        w.put_byte(TS_RAW)
        pack_ints(w, lengths)
        _code_bytes(w, stream[: int(lengths.sum())], cap)
        return
    w.put_byte(TS_TOK)
    w.put_varint(tt.k)
    w.put_bytes(tt.seps.astype(np.uint8).tobytes())
    text_parts: List[np.ndarray] = []
    text_lens: dict = {}
    text_field_ids: List[int] = []
    for k in range(tt.k):
        start, tlen = tt.tok_start[:, k], tt.tok_len[:, k]
        if _is_const(stream, start, tlen):
            w.put_byte(FS_CONST)
            w.put_varint(int(tlen[0]))
            w.put_bytes(stream[start[0]: start[0] + tlen[0]].tobytes())
            continue
        vals = _numeric_values(stream, start, tlen)
        if vals is not None:
            diffs = np.diff(vals)
            if R >= 2 and (diffs == diffs[0]).all():
                w.put_byte(FS_NUM_DELTA_CONST)
                w.put_svarint(int(vals[0]))
                w.put_svarint(int(diffs[0]))
                continue
            cost_v = int(vals.max() - vals.min()).bit_length() * R
            cost_d = (int(diffs.max() - diffs.min()).bit_length() * (R - 1)
                      if R >= 2 else 1 << 30)
            if cost_d < cost_v:
                w.put_byte(FS_NUM_DELTA)
                w.put_svarint(int(vals[0]))
                pack_ints(w, diffs)
            else:
                w.put_byte(FS_NUM_VALUE)
                pack_ints(w, vals)
            continue
        w.put_byte(FS_TEXT)
        pack_ints(w, tlen)
        text_parts.append(_extract_field(stream, start, tlen))
        text_lens[k] = tlen
        text_field_ids.append(k)
    text = np.concatenate(text_parts) if text_parts else np.zeros(0, np.uint8)
    ctx = _text_ctx(text_lens, text_field_ids)
    _code_text(w, text, ctx, cap)


# --------------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------------

def _num_to_bytes(vals: np.ndarray):
    """Vectorized decimal rendering: returns (concat bytes, lens [R])."""
    v = np.asarray(vals, np.int64)
    strs = np.char.mod("%d", v)
    lens = np.char.str_len(strs).astype(np.int64)
    maxw = int(lens.max()) if len(lens) else 1
    mat = strs.astype(f"S{maxw}").view(np.uint8).reshape(len(v), maxw)
    mask = np.arange(maxw)[None, :] < lens[:, None]
    return mat[mask], lens


def decode_tags(r: BitReader, num_rec: int, cap: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (concat title bytes, lengths [R])."""
    scheme = r.get_byte()
    if scheme == TS_EMPTY:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    if scheme == TS_RAW:
        lengths = unpack_ints(r)
        stream = _decode_bytes(r, cap)
        return stream, lengths
    k = r.get_varint()
    seps = np.frombuffer(r.get_bytes(k - 1), np.uint8) if k > 1 \
        else np.zeros(0, np.uint8)
    R = num_rec
    field_bytes: List[Optional[np.ndarray]] = []   # None => from text stream
    field_lens: List[np.ndarray] = []
    text_fields: List[int] = []
    for fk in range(k):
        fs = r.get_byte()
        if fs == FS_CONST:
            ln = r.get_varint()
            tok = np.frombuffer(r.get_bytes(ln), np.uint8)
            field_bytes.append(np.tile(tok, R))
            field_lens.append(np.full(R, ln, np.int64))
        elif fs == FS_NUM_DELTA_CONST:
            v0 = r.get_svarint()
            d = r.get_svarint()
            vals = v0 + d * np.arange(R, dtype=np.int64)
            b, lens = _num_to_bytes(vals)
            field_bytes.append(b)
            field_lens.append(lens)
        elif fs == FS_NUM_VALUE:
            vals = unpack_ints(r)
            b, lens = _num_to_bytes(vals)
            field_bytes.append(b)
            field_lens.append(lens)
        elif fs == FS_NUM_DELTA:
            v0 = r.get_svarint()
            diffs = unpack_ints(r)
            vals = np.concatenate([[v0], v0 + np.cumsum(diffs)]).astype(
                np.int64)
            b, lens = _num_to_bytes(vals)
            field_bytes.append(b)
            field_lens.append(lens)
        elif fs == FS_TEXT:
            tlens = unpack_ints(r)
            field_bytes.append(None)
            field_lens.append(tlens)
            text_fields.append(fk)
        else:
            raise ValueError(f"bad tag field scheme {fs}")
    ctx = _text_ctx(field_lens, text_fields)
    text = _decode_text(r, ctx, cap)
    # split the shared text stream back into per-field chunks
    off = 0
    for fk in text_fields:
        total = int(field_lens[fk].sum())
        field_bytes[fk] = text[off: off + total]
        off += total
    # assemble titles: token_0 sep_0 token_1 ... sep_{K-2} token_{K-1}
    lens_mat = np.stack(field_lens, axis=1) if k else np.zeros((R, 0))
    title_lens = lens_mat.sum(1) + (k - 1)
    total_out = int(title_lens.sum())
    out = np.zeros(total_out, np.uint8)
    title_starts = np.concatenate([[0], np.cumsum(title_lens)[:-1]]).astype(
        np.int64)
    cum_k = title_starts.copy()                 # running dst offset per record
    for fk in range(k):
        content, lens = field_bytes[fk], field_lens[fk]
        total = int(lens.sum())
        if total:
            reps = np.repeat(np.arange(R, dtype=np.int64), lens)
            offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
            within = np.arange(total, dtype=np.int64) - offs[reps]
            out[cum_k[reps] + within] = content
        cum_k = cum_k + lens
        if fk < k - 1:
            out[cum_k] = seps[fk]
            cum_k = cum_k + 1
    return out, title_lens.astype(np.int64)
