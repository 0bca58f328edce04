"""Pallas TPU kernels for the positional shared-row rANS wavefront.

History: these kernels were written when the XLA formulation re-streamed
the whole [L, Wp] payload through HBM every chunk (t_steps^2/2 traffic,
~160 MB/s/chip).  The XLA wavefronts have since adopted per-lane 2-tile
sliding windows (ops/rans.py) that eliminate that traffic in-graph, and
they measure FASTER than these kernels on the current toolchain — the
kernels remain as the VMEM-resident formulation (payload written once,
window ops on-chip by construction) and as ablation hooks, opt-in via
DSRC_TPU_PALLAS=1 (see uniform_pipeline._pallas_mode for the measured
numbers and the dev-runtime caveat).

The kernels reproduce the EXACT stream format of ops/rans.py
(rans_encode_from_freqs pair layout, single-emission 16-bit renorm,
M = 2^14): payloads produced by either implementation decode with the
other.  Replaces the hot per-symbol loops of the reference's range coder
(RangeCoder.h:57-84, SymbolCoderRC.h:39-63) with a lane-parallel VMEM
wavefront instead of a scalar carry chain.

Grid: one cell per LANE TILE (LT lanes).  vmap adds the block-batch
dimension.  All shapes static; scalars (num_rec) ride in SMEM.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rans import M, PROB_BITS, RANS_L, _MASK, _U16

LT = 256          # lanes per grid cell
UE = 32           # encode symbols per chunk
NPAIR = UE // 2 + 1
DEC_UE = 16       # decode symbols per chunk (smaller: the unrolled decode
                  # body is bigger per symbol and Mosaic compile memory
                  # scales with it; the stream format is chunk-agnostic)
DEC_NPAIR = DEC_UE // 2 + 1

# profiling-only kernel ablations ("emit", "tab", comma-separable); wrong
# results when set — used by tools/profile_uniform.py to attribute cost
_STRIP = os.environ.get("RANS_PALLAS_STRIP", "")


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _rup(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _u32_to_f32(x):
    """Exact round-to-nearest u32 -> f32 (Mosaic lacks the direct cast):
    split into two sub-2^16 halves, which cast losslessly via int32."""
    hi = (x >> np.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    lo = (x & _U16).astype(jnp.int32).astype(jnp.float32)
    return hi * 65536.0 + lo


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------

def _enc_kernel(fq_ref, cu_ref, act_ref, payload_ref, meta_ref, *,
                t_steps: int, wp: int, wmax: int):
    """One lane tile: reverse rANS wavefront over precomputed per-symbol
    (freq, cum) streams — the VMEM form of ops/rans.rans_encode_from_freqs.
    Symbol-model lookups happen OUTSIDE (bulk MXU contractions), so the
    substep is pure integer rANS arithmetic.

    fq_ref/cu_ref: [T, LT] i32 freq/cum per symbol (decode order; inactive
                   entries freq=1)
    act_ref:       [T, LT] i32 0/1 active mask
    payload_ref:   [LT, Wp] i32 u16-pairs out
    meta_ref:      [2, LT] i32 out — row 0 final state bits, row 1 nwords
    """
    payload_ref[:, :] = jnp.zeros((LT, wp), jnp.int32)
    chunks = _cdiv(t_steps, UE)
    wi = jax.lax.broadcasted_iota(jnp.int32, (LT, wp), 1)    # [LT, Wp]
    ue_ids = jax.lax.broadcasted_iota(jnp.int32, (UE, LT), 0)

    def chunk_body(ci, carry):
        x, b = carry                                         # [1, LT] each
        tc = (chunks - 1 - ci) * UE
        fblk = fq_ref[pl.ds(tc, UE), :]                      # [UE, LT]
        cblk = cu_ref[pl.ds(tc, UE), :]
        ablk = act_ref[pl.ds(tc, UE), :]
        w8 = jnp.zeros((UE, LT), jnp.int32)
        le = jnp.zeros((1, LT), jnp.int32)
        for u in range(UE - 1, -1, -1):
            a = ablk[u:u + 1, :] != 0                        # [1, LT]
            fq = fblk[u:u + 1, :].astype(jnp.uint32)
            cu = cblk[u:u + 1, :]
            # ---- _enc_sym (ops/rans.py:135) ----
            do_emit = a & (x >= (fq << np.uint32(PROB_BITS + 4)))
            word = (x & _U16).astype(jnp.int32)
            x = jnp.where(do_emit, x >> np.uint32(16), x)
            # x // fq via f32 reciprocal (q < 2^24, so f32->i32 is exact;
            # Mosaic has no u32<->f32 casts — route through i32)
            q = (_u32_to_f32(x) * (1.0 / _u32_to_f32(fq))) \
                .astype(jnp.int32).astype(jnp.uint32)
            r = x - q * fq
            over = r >= np.uint32(1 << 31)
            q = jnp.where(over, q - np.uint32(1), q)
            r = jnp.where(over, r + fq, r)
            under = r >= fq
            q = jnp.where(under, q + np.uint32(1), q)
            r = jnp.where(under, r - fq, r)
            xn = (q << np.uint32(PROB_BITS)) + cu.astype(jnp.uint32) + r
            x = jnp.where(a, xn, x)
            # place emitted word at per-lane slot le
            put = do_emit & (le == ue_ids)                   # [UE, LT]
            w8 = jnp.where(put, word, w8)
            le = le + do_emit.astype(jnp.int32)
        # ---- pair-merge the chunk's emissions on the VMEM tile (the
        # dense form of the block-accumulate in
        # ops/rans.py:rans_encode_from_freqs, over the full wp) ----
        ws0 = wmax - 1 - b                                   # [1, LT]
        base = ws0 >> 1
        ws = ws0 - ue_ids                                    # [UE, LT]
        val = jnp.where((ws & 1) == 1, w8 << 16, w8)
        val = jnp.where(ue_ids < le, val, 0)
        pidx = ws >> 1
        if "emit" not in _STRIP:                             # ablation
            add = jnp.zeros((LT, wp), jnp.int32)
            basec = base.reshape(LT, 1)
            for m in range(NPAIR):
                pv = jnp.sum(jnp.where(pidx == (base - m), val, 0),
                             axis=0).reshape(LT, 1)          # [LT, 1]
                add = add + jnp.where(wi == (basec - m), pv, 0)
            payload_ref[:, :] = payload_ref[:, :] + add
        return x, b + le

    x0 = jnp.full((1, LT), RANS_L, jnp.uint32)
    b0 = jnp.zeros((1, LT), jnp.int32)
    x, b = jax.lax.fori_loop(0, chunks, chunk_body, (x0, b0))
    meta_ref[0:1, :] = x.astype(jnp.int32)
    meta_ref[1:2, :] = b


@functools.partial(jax.jit, static_argnames=("wp_out", "interpret"))
def rans_encode_from_freqs_tpu(freq: jnp.ndarray, cum: jnp.ndarray,
                               active: jnp.ndarray, wp_out: int,
                               interpret: bool = False):
    """Drop-in for ops/rans.rans_encode_from_freqs as a Pallas kernel.

    freq/cum/active: [T, L] per-symbol streams in decode order.
    Returns (payload [L, wp_out] i32 pairs, nwords [L], states [L] u32) in
    the exact rans_encode_from_freqs bit layout.
    """
    t_steps, ll = freq.shape
    tp = _rup(t_steps, UE)
    wmax = tp + UE
    wp = max(wmax // 2, wp_out)
    wp_pad = _rup(wp, 128)
    lt_tiles = _cdiv(ll, LT)
    ll_pad = lt_tiles * LT
    t_pad = _rup(tp, UE)

    def prep(arr, fill):
        return jnp.pad(arr.astype(jnp.int32),
                       ((0, t_pad - t_steps), (0, ll_pad - ll)),
                       constant_values=fill)

    fq = prep(jnp.where(active, freq, 1), 1)
    cu = prep(jnp.where(active, cum, 0), 0)
    act = prep(active.astype(jnp.int32), 0)

    kern = functools.partial(_enc_kernel, t_steps=t_steps,
                             wp=wp_pad, wmax=2 * wp_pad)
    payload, meta = pl.pallas_call(
        kern,
        grid=(lt_tiles,),
        in_specs=[
            pl.BlockSpec((t_pad, LT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, LT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, LT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((LT, wp_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ll_pad, wp_pad), jnp.int32),
            jax.ShapeDtypeStruct((2, ll_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(fq, cu, act)
    # canonical layout: the kernel pair space is [0, 2*wp_pad); the
    # canonical one is [0, 2*wp_out).  Words sit right-aligned in both, so
    # slice the LAST wp_out pairs (the u16-slot shift is even, preserving
    # pair parity).
    payload = payload[:ll, wp_pad - wp_out:]
    states = meta[0, :ll].astype(jnp.uint32)
    nwords = meta[1, :ll]
    return payload, nwords, states


def encode_positional_tpu(mat: jnp.ndarray, num_rec, table: jnp.ndarray,
                          p: int, nsym: int, group: int, wp_out: int,
                          interpret: bool = False):
    """mat: [Rpad, P] i32 symbols; table: [P, A] quantized freqs.

    Positional front end: group the symbols to [T, L], bulk (freq, cum)
    lookups via the fused VPU select chain
    (parallel/uniform_pipeline._lookup_rows), then the generic VMEM encode
    kernel.
    """
    from ..parallel.uniform_pipeline import _lookup_rows
    rpad, pp = mat.shape
    assert pp == p
    ll = rpad // group
    t_steps = group * p
    cumfull = jnp.concatenate(
        [jnp.zeros((p, 1), jnp.int32), jnp.cumsum(table, axis=1)], axis=1)

    lanes = mat.reshape(ll, group, p).transpose(1, 2, 0) \
        .reshape(t_steps, ll)
    tab_t = jnp.tile(table, (group, 1))
    cum_t = jnp.tile(cumfull[:, :nsym], (group, 1))
    f, cu = _lookup_rows(lanes, tab_t, cum_t, nsym)          # [T, L]

    rec_idx = (jnp.arange(ll, dtype=jnp.int32) * group)[None, :] + \
        (jnp.arange(t_steps, dtype=jnp.int32) // p)[:, None]
    active = rec_idx < jnp.asarray(num_rec, jnp.int32)
    return rans_encode_from_freqs_tpu(f, cu, active, wp_out,
                                      interpret=interpret)


# --------------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------------

def _dec_kernel(nrec_ref, payload_ref, meta_ref, ftab_ref, ctab_ref,
                syms_ref, prev_ref, *, t_steps: int, p: int, group: int,
                wp: int, nsym: int, left: bool, delta: bool):
    """One lane tile: forward rANS wavefront.

    payload_ref: [LT, Wp] i32 pairs
    meta_ref:    [2, LT] i32 — row 0 state bits, row 1 nwords
    syms_ref:    [T, LT] i32 out
    prev_ref:    [P, LT] i32 scratch (vertical-delta state)
    """
    tile = pl.program_id(0)
    num_rec = nrec_ref[0, 0]
    lane_base = (tile * LT + jax.lax.broadcasted_iota(
        jnp.int32, (1, LT), 1)) * group
    x = meta_ref[0:1, :].astype(jnp.uint32)
    nw = meta_ref[1:2, :]
    wptr = jnp.zeros((1, LT), jnp.int32) if left else (2 * wp - nw)
    chunks = _cdiv(t_steps, DEC_UE)
    if delta:
        prev_ref[:, :] = jnp.zeros((p, LT), jnp.int32)
    wi = jax.lax.broadcasted_iota(jnp.int32, (LT, wp), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (LT, 128), 1)

    def chunk_body(ci, carry):
        x, wptr = carry
        tc = ci * DEC_UE
        # extract DEC_NPAIR consecutive pairs per lane starting at wptr >> 1
        basec = (wptr >> 1).reshape(LT, 1)
        pairs = []
        pl_tile = payload_ref[:, :]
        for m in range(DEC_NPAIR):
            pairs.append(jnp.sum(
                jnp.where(wi == basec + m, pl_tile, 0), axis=1)
                .reshape(1, LT))
        phase = wptr & 1
        o = jnp.zeros((1, LT), jnp.int32)
        out_syms = []
        for u in range(DEC_UE):
            t = tc + u
            g = t // p
            pos = t - g * p
            act = ((lane_base + g) < num_rec) & (t < t_steps)
            crow = ctab_ref[pl.ds(pos, 1), :]                # [1, 128]
            frow = ftab_ref[pl.ds(pos, 1), :]
            slot = (x & _MASK).astype(jnp.int32)             # [1, LT]
            ge = (slot.reshape(LT, 1) >= crow.reshape(1, 128)) & \
                (col > 0) & (col < nsym)
            sym = jnp.sum(ge.astype(jnp.int32), axis=1).reshape(1, LT)
            oh = sym.reshape(LT, 1) == col
            f = jnp.sum(jnp.where(oh, frow.reshape(1, 128), 0),
                        axis=1).reshape(1, LT)
            cu = jnp.sum(jnp.where(oh, crow.reshape(1, 128), 0),
                         axis=1).reshape(1, LT)
            fu = jnp.where(act, f, 1).astype(jnp.uint32)
            xn = fu * (x >> np.uint32(PROB_BITS)) + \
                slot.astype(jnp.uint32) - cu.astype(jnp.uint32)
            need = act & (xn < RANS_L)
            lp = (phase + o) >> 1
            half = (phase + o) & 1
            pair = jnp.zeros((1, LT), jnp.int32)
            for m in range(DEC_NPAIR):
                pair = jnp.where(lp == m, pairs[m], pair)
            w = (jnp.where(half == 1, pair >> 16, pair) & 0xFFFF) \
                .astype(jnp.uint32)
            xn = jnp.where(need, (xn << np.uint32(16)) | w, xn)
            x = jnp.where(act, xn, x)
            o = o + need.astype(jnp.int32)
            if delta:
                prev = prev_ref[pl.ds(pos, 1), :]
                sym = (sym + prev) & (nsym - 1)
                prev_ref[pl.ds(pos, 1), :] = sym
            out_syms.append(sym)
        # one dynamic store per chunk (16 per-substep row stores made the
        # Mosaic compile/runtime pathological)
        syms_ref[pl.ds(tc, DEC_UE), :] = jnp.concatenate(out_syms, axis=0)
        return x, wptr + o

    jax.lax.fori_loop(0, chunks, chunk_body, (x, wptr))


@functools.partial(jax.jit, static_argnames=("p", "rpad", "nsym", "group",
                                             "left", "delta", "interpret"))
def decode_positional_tpu(payload: jnp.ndarray, states: jnp.ndarray,
                          nwords: jnp.ndarray, table: jnp.ndarray, num_rec,
                          p: int, rpad: int, nsym: int, group: int,
                          left: bool = False, delta: bool = False,
                          interpret: bool = False):
    """Mirror of encode_positional_tpu; returns mat [Rpad, P] i32."""
    ll = rpad // group
    t_steps = group * p
    wp = payload.shape[1]
    wp_pad = _rup(wp, 128)
    lt_tiles = _cdiv(ll, LT)
    ll_pad = lt_tiles * LT
    t_pad = _rup(t_steps, DEC_UE)

    # keep words right-aligned in the padded pair space (left mode keeps
    # word pointer 0, so left-pad only in right-aligned mode)
    if left:
        payload_p = jnp.pad(payload, ((0, ll_pad - ll),
                                      (0, wp_pad - wp)))
    else:
        payload_p = jnp.pad(payload, ((0, ll_pad - ll),
                                      (wp_pad - wp, 0)))
    meta = jnp.stack([
        jnp.pad(states.astype(jnp.int32), (0, ll_pad - ll)),
        jnp.pad(nwords.astype(jnp.int32), (0, ll_pad - ll)),
    ])
    cumfull = jnp.concatenate(
        [jnp.zeros((p, 1), jnp.int32), jnp.cumsum(table, axis=1)], axis=1)
    ftab = jnp.pad(table, ((0, 0), (0, 128 - nsym)), constant_values=1)
    ctab = jnp.pad(cumfull[:, :nsym], ((0, 0), (0, 128 - nsym)),
                   constant_values=1 << 20)
    ctab = ctab.at[:, 0].set(0)

    kern = functools.partial(_dec_kernel, t_steps=t_steps, p=p, group=group,
                             wp=wp_pad, nsym=nsym, left=left, delta=delta)
    syms = pl.pallas_call(
        kern,
        grid=(lt_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((LT, wp_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LT), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_pad, LT), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, ll_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((p, LT), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(num_rec, jnp.int32).reshape(1, 1), payload_p, meta,
      ftab, ctab)
    lanes = syms[:t_steps, :ll]
    return lanes.reshape(group, p, ll).transpose(2, 0, 1).reshape(rpad, p)
