"""Fully device-resident block pipeline — the flagship throughput path.

The archive/CLI path (models/block.py) round-trips through host bytes, which
is correct but transfer-bound on tunneled links.  This module keeps the
ENTIRE block round-trip on device: parse → transform → encode, and
decode → inverse transform → FASTQ text re-layout, with the compressed
representation living in HBM as fixed-shape tensors.  One jit dispatch per
block per direction; only scalar sizes/verdicts cross to the host.

On a production TPU host this is also the right architecture: input text is
DMA'd to HBM once, blocks are compressed on-chip, and only compressed bytes
(3-4× smaller) return — the reference's pipeline does the mirror image with
CPU worker threads (DsrcWorker.cpp:30-73).

Scheme fixing (vs the adaptive per-block proxies of models/*): DNA is coded
with a 20-symbol alphabet under 2-bit-packed ACGT context (order = 3×level),
quality with positional (q0) or positional+history (q1/q2) contexts over the
full 256-value alphabet, titles with order-1 byte contexts, lengths bit-packed.
Band-adaptive rANS makes fixed alphabets nearly free (unused symbols cost
only Laplace smoothing), so these schemes are universal — any FASTQ block
round-trips exactly (plain layout: '+' lines, no color-space primers).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ctx as C
from ..ops import parser as P
from ..ops import transform as T
from ..ops.rans import lane_active, lane_merge, lane_split

DNA_A = 20          # 19 alphabet symbols + 1 spare (invalid)
QUAL_A = 256
TAG_A = 256
POS_CAP = 256
POS_BUCKETS = 16
HASH_MUL = 37


def _lane_geom(cap: int):
    num_lanes = C.pick_num_lanes(cap)
    t_steps = -(-cap // num_lanes)
    return num_lanes, t_steps, C.band_edges(t_steps)


def _lane_lengths(n, num_lanes: int, t_steps: int):
    nn = jnp.asarray(n, jnp.int32)
    starts = jnp.minimum(jnp.arange(num_lanes, dtype=jnp.int32) * t_steps, nn)
    return jnp.minimum(starts + t_steps, nn) - starts


def _enc(stream, n, ctx, num_ctx, nsym, cap):
    num_lanes, t_steps, edges = _lane_geom(cap)
    lanes = lane_split(stream.astype(jnp.int32), num_lanes)
    ctxl = lane_split(ctx.astype(jnp.int32), num_lanes)
    active = lane_active(t_steps, _lane_lengths(n, num_lanes, t_steps))
    payload, nwords, states = C.encode_ctx_lanes(
        jnp.where(active, lanes, 0), active, jnp.where(active, ctxl, 0),
        num_ctx, nsym, edges)
    return payload, nwords, states


def _dec_precomputed(payload, states, nwords, n, ctx, num_ctx, nsym, cap):
    num_lanes, t_steps, edges = _lane_geom(cap)
    lengths = _lane_lengths(n, num_lanes, t_steps)
    ctxl = lane_split(ctx.astype(jnp.int32), num_lanes)
    active = lane_active(t_steps, lengths)
    syms = C.decode_ctx_precomputed(
        payload, states, lengths, t_steps, num_ctx, nsym, edges,
        jnp.where(active, ctxl, 0), nwords=nwords)
    return lane_merge(syms, t_steps * num_lanes)[:cap]


def _dna_ctx(syms, order: int):
    """Context from 2-bit-packed clipped history (A=20 alphabet)."""
    return None  # computed lane-wise in _enc_history


def _enc_history(stream, n, nsym, order, sym_bits, cap, reset=None,
                 pos_extra=None, pos_bits=0):
    """History-context encode: ctx = packed/hashed history (with optional
    per-record reset and positional mixing).  Encoder-side bulk version."""
    num_lanes, t_steps, edges = _lane_geom(cap)
    lanes = lane_split(stream.astype(jnp.int32), num_lanes)
    active = lane_active(t_steps, _lane_lengths(n, num_lanes, t_steps))
    lanes = jnp.where(active, lanes, 0)
    hb = min(order * sym_bits, 10)
    use_hash = order * sym_bits > hb
    hmask = (1 << hb) - 1
    base = jnp.minimum(lanes, (1 << sym_bits) - 1)
    if reset is None:
        resetl = jnp.zeros_like(lanes)
    else:
        resetl = lane_split(reset.astype(jnp.int32), num_lanes)

    def step(h, inp):
        s, rs = inp
        h_eff = jnp.where(rs > 0, 0, h)
        if use_hash:
            h2 = (h_eff * HASH_MUL + s + 1) & hmask
        else:
            h2 = ((h_eff << sym_bits) | s) & hmask
        return h2, h_eff

    _, hist_ctx = jax.lax.scan(
        step, jnp.zeros((num_lanes,), jnp.int32), (base, resetl))
    num_ctx = 1 << hb
    ctx = hist_ctx
    if pos_extra is not None:
        pe = lane_split(pos_extra.astype(jnp.int32), num_lanes)
        ctx = ctx | (pe << hb)
        num_ctx <<= pos_bits
    payload, nwords, states = C.encode_ctx_lanes(
        lanes, active, jnp.where(active, ctx, 0), num_ctx, nsym, edges)
    return payload, nwords, states, (hb, use_hash, num_ctx)


def _dec_history(payload, states, nwords, n, nsym, order, sym_bits, cap,
                 reset=None, pos_extra=None, pos_bits=0):
    num_lanes, t_steps, edges = _lane_geom(cap)
    lengths = _lane_lengths(n, num_lanes, t_steps)
    hb = min(order * sym_bits, 10)
    use_hash = order * sym_bits > hb
    hmask = (1 << hb) - 1
    num_ctx = (1 << hb) << pos_bits
    resetl = jnp.zeros((t_steps, num_lanes), jnp.int32) if reset is None \
        else lane_split(reset.astype(jnp.int32), num_lanes)
    pel = None if pos_extra is None \
        else lane_split(pos_extra.astype(jnp.int32), num_lanes)

    def ctx_of(carry, t):
        rs = jax.lax.dynamic_index_in_dim(resetl, t, 0, keepdims=False)
        h_eff = jnp.where(rs > 0, 0, carry)
        if pel is None:
            return h_eff
        pe = jax.lax.dynamic_index_in_dim(pel, t, 0, keepdims=False)
        return h_eff | (pe << hb)

    def carry_update(carry, sym, t):
        rs = jax.lax.dynamic_index_in_dim(resetl, t, 0, keepdims=False)
        h_eff = jnp.where(rs > 0, 0, carry)
        s = jnp.minimum(sym, (1 << sym_bits) - 1)
        if use_hash:
            return (h_eff * HASH_MUL + s + 1) & hmask
        return ((h_eff << sym_bits) | s) & hmask

    syms = C.decode_ctx_lanes(
        payload, states, lengths, t_steps, num_ctx, nsym, edges,
        jnp.zeros((num_lanes,), jnp.int32), ctx_of, carry_update,
        nwords=nwords)
    return lane_merge(syms, t_steps * num_lanes)[:cap]


# --------------------------------------------------------------------------
# Whole-block compress / decompress (single jit each)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "cap", "rcap", "dna_order", "quality_order", "offset"))
def compress_block_device(block: jnp.ndarray, nbytes: jnp.ndarray,
                          cap: int, rcap: int, dna_order: int,
                          quality_order: int, offset: int = 33):
    parsed = P.parse_block(block, nbytes, rcap)
    titles, t_total, _ = P.gather_stream(
        block, parsed.title_start, parsed.title_len, cap)
    seqs, s_total, _ = P.gather_stream(
        block, parsed.seq_start, parsed.seq_len, cap)
    quals, q_total, _ = P.gather_stream(
        block, parsed.qual_start, parsed.qual_len, cap)
    active = jnp.arange(cap, dtype=jnp.int32) < s_total
    seq_sym = T.dna_remap(seqs)
    qv = jnp.clip(jnp.where(active, quals.astype(jnp.int32) - offset, 0),
                  0, 255)
    dna, dna_total, qual_out, _ = T.forward_lossless(seq_sym, qv, active)

    # --- DNA: history of 2-bit-clipped symbols, alphabet 20
    dp, dn, dst, _ = _enc_history(jnp.clip(dna, 0, DNA_A - 1), dna_total,
                                  DNA_A, dna_order, 2, cap)
    # --- quality: positional (+history for order>0) over alphabet 256
    cum = jnp.cumsum(parsed.qual_len)
    idx = jnp.arange(cap, dtype=jnp.int32)
    rec_of = jnp.searchsorted(cum, idx, side="right").astype(jnp.int32)
    pos_of = idx - jnp.take(cum - parsed.qual_len, rec_of, mode="clip")
    rlen = jnp.take(parsed.qual_len, rec_of, mode="clip")
    if quality_order == 0:
        qctx = jnp.minimum(pos_of, POS_CAP - 1)
        qp, qn, qst = _enc(qual_out, q_total, qctx, POS_CAP, QUAL_A, cap)
    else:
        bucket = jnp.minimum(POS_BUCKETS - 1,
                             (pos_of * POS_BUCKETS) // jnp.maximum(rlen, 1))
        qp, qn, qst, _ = _enc_history(
            qual_out, q_total, QUAL_A, quality_order, 6, cap,
            reset=(pos_of == 0), pos_extra=bucket, pos_bits=4)
    # --- titles: order-1 byte contexts
    tp, tn, tst, _ = _enc_history(titles, t_total, TAG_A, 1, 8, cap)

    num_lanes, _, _ = _lane_geom(cap)
    side = 6 * 3 * num_lanes  # states + word counts, 3 streams
    # lengths: bit-packed to the per-block width (device arithmetic only)
    rmask = jnp.arange(rcap, dtype=jnp.int32) < parsed.num_records
    qlmax = jnp.max(jnp.where(rmask, parsed.qual_len, 0))
    qlmin = jnp.min(jnp.where(rmask, parsed.qual_len, 1 << 30))
    width = jnp.ceil(jnp.log2(jnp.maximum(qlmax - qlmin + 1, 2)))
    tlmax = jnp.max(jnp.where(rmask, parsed.title_len, 0))
    tlmin = jnp.min(jnp.where(rmask, parsed.title_len, 1 << 30))
    twidth = jnp.ceil(jnp.log2(jnp.maximum(tlmax - tlmin + 1, 2)))
    len_bytes = (parsed.num_records * (width + twidth)) / 8 + 16
    comp_bytes = (2 * (dn.sum() + qn.sum() + tn.sum())
                  + side + len_bytes.astype(jnp.int32))
    return dict(
        num_records=parsed.num_records, nbytes=nbytes,
        title_len=parsed.title_len, qual_len=parsed.qual_len,
        t_total=t_total, q_total=q_total, dna_total=dna_total,
        tag=(tp, tn, tst), qual=(qp, qn, qst), dna=(dp, dn, dst),
        comp_bytes=comp_bytes)


@functools.partial(jax.jit, static_argnames=(
    "cap", "rcap", "dna_order", "quality_order", "offset"))
def decompress_block_device(comp, cap: int, rcap: int, dna_order: int,
                            quality_order: int, offset: int = 33):
    title_len = comp["title_len"]
    qual_len = comp["qual_len"]
    t_total, q_total = comp["t_total"], comp["q_total"]
    # --- titles
    tp, tn, tst = comp["tag"]
    titles = _dec_history(tp, tst, tn, t_total, TAG_A, 1, 8, cap)
    # --- quality
    cum = jnp.cumsum(qual_len)
    idx = jnp.arange(cap, dtype=jnp.int32)
    rec_of = jnp.searchsorted(cum, idx, side="right").astype(jnp.int32)
    pos_of = idx - jnp.take(cum - qual_len, rec_of, mode="clip")
    rlen = jnp.take(qual_len, rec_of, mode="clip")
    qp, qn, qst = comp["qual"]
    if quality_order == 0:
        qctx = jnp.minimum(pos_of, POS_CAP - 1)
        qual_out = _dec_precomputed(qp, qst, qn, q_total, qctx, POS_CAP,
                                    QUAL_A, cap)
    else:
        bucket = jnp.minimum(POS_BUCKETS - 1,
                             (pos_of * POS_BUCKETS) // jnp.maximum(rlen, 1))
        qual_out = _dec_history(qp, qst, qn, q_total, QUAL_A, quality_order,
                                6, cap, reset=(pos_of == 0),
                                pos_extra=bucket, pos_bits=4)
    # --- dna
    dp, dn, dst = comp["dna"]
    dna = _dec_history(dp, dst, dn, comp["dna_total"], DNA_A, dna_order, 2,
                       cap)
    # --- inverse transform
    active = idx < q_total
    seq_sym, qv = T.backward_lossless(dna, jnp.where(active, qual_out, 0),
                                      active)
    seq = T.dna_unmap(jnp.where(active, seq_sym, 0))
    qual = jnp.where(active, qv + offset, 0).astype(jnp.uint8)
    # --- FASTQ text re-layout (all scatters)
    rmask = jnp.arange(rcap, dtype=jnp.int32) < comp["num_records"]
    tl = jnp.where(rmask, title_len, 0)
    ql = jnp.where(rmask, qual_len, 0)
    rec_len = 1 + tl + 1 + ql + 1 + 2 + ql + 1
    starts = jnp.cumsum(rec_len) - rec_len
    out = jnp.zeros((cap,), jnp.uint8)
    at_sym = jnp.uint8(ord("@"))
    nl_sym = jnp.uint8(10)
    plus_sym = jnp.uint8(ord("+"))
    at = jnp.where(rmask, starts, cap)
    out = out.at[at].set(at_sym, mode="drop")
    out = _scatter(out, titles, tl, starts + 1, cap)
    nl1 = starts + 1 + tl
    out = out.at[jnp.where(rmask, nl1, cap)].set(nl_sym, mode="drop")
    out = _scatter(out, seq, ql, nl1 + 1, cap)
    nl2 = nl1 + 1 + ql
    out = out.at[jnp.where(rmask, nl2, cap)].set(nl_sym, mode="drop")
    out = out.at[jnp.where(rmask, nl2 + 1, cap)].set(plus_sym, mode="drop")
    out = out.at[jnp.where(rmask, nl2 + 2, cap)].set(nl_sym, mode="drop")
    out = _scatter(out, qual, ql, nl2 + 3, cap)
    out = out.at[jnp.where(rmask, nl2 + 3 + ql, cap)].set(nl_sym,
                                                          mode="drop")
    total = jnp.sum(rec_len * rmask)
    return out, total


def _scatter(out, stream, lens, dst_starts, cap):
    """Place per-record stream ranges at dst positions (scatter)."""
    cum = jnp.cumsum(lens)
    j = jnp.arange(cap, dtype=jnp.int32)
    rec = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    in_rec = j < cum[-1]
    dst = jnp.take(dst_starts, rec, mode="clip") + \
        (j - jnp.take(cum - lens, rec, mode="clip"))
    return out.at[jnp.where(in_rec, dst, cap)].set(
        stream.astype(jnp.uint8), mode="drop")


@functools.partial(jax.jit, static_argnames=("cap",))
def blocks_equal(a: jnp.ndarray, b: jnp.ndarray, n, cap: int):
    idx = jnp.arange(cap, dtype=jnp.int32)
    return jnp.all(jnp.where(idx < n, a == b, True))
