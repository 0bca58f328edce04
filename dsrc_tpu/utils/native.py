"""ctypes bindings for the native host library (native/host_ops.cpp).

Loads native/libdsrc_host.so when present (build with `make -C native`);
every entry point has a numpy fallback so the package works without the
native build.  pybind11 is not available in this image, hence plain C ABI.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(root, "native", "libdsrc_host.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    i64 = ctypes.c_int64
    lib.dsrc_scan_records.restype = i64
    lib.dsrc_scan_records.argtypes = [u8p, i64, i64,
                                      ctypes.POINTER(ctypes.c_int64)]
    lib.dsrc_pack2.restype = None
    lib.dsrc_pack2.argtypes = [u8p, i64, u8p]
    lib.dsrc_unpack2.restype = None
    lib.dsrc_unpack2.argtypes = [u8p, i64, u8p]
    lib.dsrc_compact_payload.restype = i64
    lib.dsrc_compact_payload.argtypes = [i32p, i64, i64, i32p, u16p]
    lib.dsrc_compact_payload_right.restype = i64
    lib.dsrc_compact_payload_right.argtypes = [i32p, i64, i64, i32p, u16p]
    lib.dsrc_expand_payload.restype = None
    lib.dsrc_expand_payload.argtypes = [u16p, i64, i64, i32p, i32p]
    i64p = ctypes.POINTER(ctypes.c_int64)
    if hasattr(lib, "dsrc_stage_semi"):
        lib.dsrc_stage_semi.restype = i64
        lib.dsrc_stage_semi.argtypes = [u8p, i64, i64, i64, u8p, u8p,
                                        u8p, i64p]
        lib.dsrc_layout_records.restype = i64
        lib.dsrc_layout_records.argtypes = [
            i64, u8p, i64p, u8p, u8p, i64p, u8p,
            ctypes.c_int32, ctypes.c_int32, u8p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def scan_records(buf: np.ndarray, lines_before: int) -> Tuple[int, int]:
    """(newline_count, cut_position_after_last_boundary_or_-1)."""
    lib = _load()
    if lib is None:
        nl_pos = np.flatnonzero(buf == 10)
        n = len(nl_pos)
        if n == 0:
            return 0, -1
        k = (lines_before + np.arange(n) + 1) % 4 == 0
        hits = np.flatnonzero(k)
        return n, (int(nl_pos[hits[-1]]) + 1 if len(hits) else -1)
    buf = np.ascontiguousarray(buf, np.uint8)
    cut = ctypes.c_int64(-1)
    count = lib.dsrc_scan_records(_u8(buf), len(buf), lines_before,
                                  ctypes.byref(cut))
    return int(count), int(cut.value)


def compact_payload(payload: np.ndarray, nwords: np.ndarray,
                    right_aligned: bool = False) -> np.ndarray:
    """[L, W] i32 rows -> flat u16 word stream.

    Left-aligned rows keep the first nwords[j] words; right-aligned rows
    (the in-scan encoder layout) keep the last nwords[j]."""
    lib = _load()
    payload = np.ascontiguousarray(payload, np.int32)
    nwords = np.ascontiguousarray(nwords, np.int32)
    total = int(nwords.sum())
    w_max = payload.shape[1]
    if lib is None:
        cols = np.arange(w_max)[None, :]
        if right_aligned:
            mask = cols >= (w_max - nwords[:, None])
        else:
            mask = cols < nwords[:, None]
        return payload[mask].astype(np.uint16)
    out = np.empty(total, np.uint16)
    fn = lib.dsrc_compact_payload_right if right_aligned \
        else lib.dsrc_compact_payload
    fn(payload.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       payload.shape[0], w_max,
       nwords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out


def expand_payload(words: np.ndarray, nwords: np.ndarray,
                   w_max: int) -> np.ndarray:
    """Flat u16 stream -> [L, w_max] i32 rows."""
    lib = _load()
    nwords = np.ascontiguousarray(nwords, np.int32)
    l = len(nwords)
    if lib is None:
        payload = np.zeros((l, w_max), np.int32)
        mask = np.arange(w_max)[None, :] < nwords[:, None]
        payload[mask] = words
        return payload
    words = np.ascontiguousarray(words, np.uint16)
    payload = np.zeros((l, w_max), np.int32)
    lib.dsrc_expand_payload(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        l, w_max,
        nwords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        payload.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return payload


def _i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def stage_semi(buf: np.ndarray, read_len: int, rpad: int):
    """One-pass semi-uniform block staging (native when built, numpy
    otherwise): validate the fixed-read-length 4-line layout and return
    (qual_mat [rpad, read_len] u8, seq_mat [rpad, read_len] u8,
    title_stream u8, title_lens i64, num_rec), or None when the block is
    not semi-layout.  Mirrors native/host_ops.cpp:dsrc_stage_semi."""
    lib = _load()
    b = np.ascontiguousarray(buf, np.uint8)
    n = len(b)
    if not (0 < read_len <= 8192) or n == 0 or b[-1] != 10:
        return None
    if lib is not None and hasattr(lib, "dsrc_stage_semi"):
        qm = np.zeros((rpad, read_len), np.uint8)
        sm = np.zeros((rpad, read_len), np.uint8)
        tbuf = np.empty(n, np.uint8)
        tlens = np.zeros(rpad, np.int64)
        rec = lib.dsrc_stage_semi(_u8(b), n, read_len, rpad, _u8(qm),
                                  _u8(sm), _u8(tbuf), _i64(tlens))
        if rec < 0:
            return None
        total = int(tlens[:rec].sum())
        return qm, sm, tbuf[:total], tlens[:rec], int(rec)
    # numpy fallback: the vectorized multi-pass equivalent
    nl = np.flatnonzero(b == 10)
    if len(nl) == 0 or len(nl) % 4 or len(nl) // 4 > rpad:
        return None
    num_rec = len(nl) // 4
    starts = np.concatenate([[0], nl[:-1] + 1])
    l0, l1 = starts[0::4], starts[1::4]
    l2, l3 = starts[2::4], starts[3::4]
    e0, e1, e2, e3 = nl[0::4], nl[1::4], nl[2::4], nl[3::4]
    if not (((e1 - l1) == read_len).all()
            and ((e3 - l3) == read_len).all()
            and ((e2 - l2) == 1).all()
            and (b[l0] == ord("@")).all()
            and (b[l2] == ord("+")).all()):
        return None
    cols = np.arange(read_len)
    qual = b[l3[:, None] + cols]
    if qual.min() < 33 or qual.max() >= 33 + 64:
        return None
    seq = b[l1[:, None] + cols]
    if not np.isin(seq, np.frombuffer(b"ACGTN", np.uint8)).all():
        return None
    qm = np.zeros((rpad, read_len), np.uint8)
    qm[:num_rec] = qual
    sm = np.zeros((rpad, read_len), np.uint8)
    sm[:num_rec] = seq
    tl = (e0 - l0 - 1).astype(np.int64)
    total = int(tl.sum())
    reps = np.repeat(np.arange(num_rec), tl)
    offs = np.concatenate([[0], np.cumsum(tl)[:-1]]).astype(np.int64)
    within = np.arange(total, dtype=np.int64) - offs[reps]
    tstream = b[(l0 + 1)[reps] + within]
    return qm, sm, tstream, tl, num_rec


def layout_records(num_rec: int, titles: np.ndarray, title_lens: np.ndarray,
                   seq: np.ndarray, qual: np.ndarray, qual_lens: np.ndarray,
                   primers, color_space: bool, plus_rep: bool) -> np.ndarray:
    """Rebuild FASTQ text from decoded streams (decode-side mirror of
    stage_semi, for ALL block schemes).  Native single pass when built;
    numpy vectorized scatters otherwise."""
    tl = np.ascontiguousarray(title_lens, np.int64)[:num_rec]
    ql = np.ascontiguousarray(qual_lens, np.int64)[:num_rec]
    sl = ql + (1 if color_space else 0)
    plus_extra = tl if plus_rep else np.zeros_like(tl)
    total = int((1 + tl + 1 + sl + 1 + 1 + plus_extra + 1 + ql + 1).sum())
    lib = _load()
    if lib is not None and hasattr(lib, "dsrc_layout_records"):
        titles = np.ascontiguousarray(titles, np.uint8)
        seq = np.ascontiguousarray(seq, np.uint8)
        qual = np.ascontiguousarray(qual, np.uint8)
        prim = np.ascontiguousarray(
            primers if primers is not None else np.zeros(num_rec, np.uint8),
            np.uint8)
        out = np.empty(total, np.uint8)
        wrote = lib.dsrc_layout_records(
            num_rec, _u8(titles), _i64(tl), _u8(seq), _u8(qual), _i64(ql),
            _u8(prim), int(color_space), int(plus_rep), _u8(out))
        assert wrote == total
        return out
    # numpy fallback: vectorized scatters
    rec_len = 1 + tl + 1 + sl + 1 + 1 + plus_extra + 1 + ql + 1
    starts = np.concatenate([[0], np.cumsum(rec_len)[:-1]]).astype(np.int64)
    out = np.zeros(total, np.uint8)
    out[starts] = ord("@")
    t_dst = starts + 1
    _scatter_var(out, titles, tl, t_dst)
    nl1 = t_dst + tl
    out[nl1] = 10
    s_dst = nl1 + 1
    if color_space:
        out[s_dst] = primers
        _scatter_var(out, seq, ql, s_dst + 1)
    else:
        _scatter_var(out, seq, ql, s_dst)
    nl2 = s_dst + sl
    out[nl2] = 10
    p_dst = nl2 + 1
    out[p_dst] = ord("+")
    if plus_rep:
        _scatter_var(out, titles, tl, p_dst + 1)
    nl3 = p_dst + 1 + plus_extra
    out[nl3] = 10
    q_dst = nl3 + 1
    _scatter_var(out, qual, ql, q_dst)
    out[q_dst + ql] = 10
    return out


def _scatter_var(out: np.ndarray, content: np.ndarray, lens: np.ndarray,
                 dst: np.ndarray) -> None:
    """out[dst[r] + i] = content[off[r] + i] for i < lens[r] (vectorized)."""
    total = int(lens.sum())
    if total == 0:
        return
    content = np.ascontiguousarray(content, np.uint8)
    reps = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    within = np.arange(total, dtype=np.int64) - offs[reps]
    out[dst[reps] + within] = content[:total]
