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
