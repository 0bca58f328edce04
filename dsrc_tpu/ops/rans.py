"""Batched rANS entropy engine — the TPU-native replacement for the
reference's scalar adaptive range coder (RangeCoder.h:44-134,
SymbolCoderRC.h:23-92) and Huffman coder (huffman.cpp).

Design (DESIGN.md §1): a symbol stream is split into L contiguous lane-chunks,
each an independent 32-bit rANS stream; a `lax.scan` wavefront advances all
lanes one symbol per step using only vector ops.  Probabilities are quantized
to a power-of-two total (M = 2^14) so decoding needs no division; renormal-
ization moves at most one 16-bit word per symbol, so it is a branchless masked
op.  The encoder runs the wavefront in reverse (standard rANS) with per-symbol
(freq, cum) precomputed in bulk; the decoder runs forward.

Model variants built on the same core:
  * static order-0          (lane-uniform table)
  * adaptive EMA            (per-lane [A] counts, division-free updates)
  * epoch-adaptive order-k  (shared [C, A] tables rebuilt from context
                             histograms after each epoch; see ctx.py)
  * positional              (lanes = records; see quality modelers)

All functions are jit-compatible with static shapes.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PROB_BITS = 14
M = 1 << PROB_BITS                 # total of every quantized model
RANS_L = np.uint32(1 << 16)        # lower bound of the normalized interval
_MASK = np.uint32(M - 1)
_ENC_SHIFT = np.uint32(PROB_BITS + 4)  # x >= freq << 18 triggers emission
_U16 = np.uint32(0xFFFF)


# --------------------------------------------------------------------------
# Lane layout helpers
# --------------------------------------------------------------------------

def lane_lengths(n: int, num_lanes: int) -> np.ndarray:
    """Per-lane symbol counts for a contiguous-chunk split of n symbols."""
    t = -(-n // num_lanes) if n else 0
    starts = np.minimum(np.arange(num_lanes) * t, n)
    ends = np.minimum(starts + t, n)
    return (ends - starts).astype(np.int32)


def lane_split(arr: jnp.ndarray, num_lanes: int) -> jnp.ndarray:
    """[n] -> [T, L] contiguous chunks (lane j covers [j*T, (j+1)*T))."""
    n = arr.shape[0]
    t = -(-n // num_lanes) if n else 1
    pad = t * num_lanes - n
    arr = jnp.pad(arr, (0, pad))
    return arr.reshape(num_lanes, t).T


def lane_merge(lanes: jnp.ndarray, n: int) -> jnp.ndarray:
    """[T, L] -> [n], inverse of lane_split."""
    return lanes.T.reshape(-1)[:n]


def lane_active(t_steps: int, lengths) -> jnp.ndarray:
    """[T, L] active mask from per-lane lengths."""
    return jnp.arange(t_steps, dtype=jnp.int32)[:, None] < \
        jnp.asarray(lengths, jnp.int32)[None, :]


# --------------------------------------------------------------------------
# Probability quantization (shared by encoder and decoder — must be
# deterministic integer math so both sides build identical tables)
# --------------------------------------------------------------------------

def quantize_counts(counts: jnp.ndarray) -> jnp.ndarray:
    """Quantize [..., A] int32 counts to freqs summing to M, all >= 1.

    Laplace-smoothed (counts + 1) so unseen contexts get a near-uniform
    model — required by epoch-adaptive coding where future symbols may be
    unseen.  Deterministic: same result on any backend.
    """
    a = counts.shape[-1]
    # sharpen sparse estimates: observed counts outweigh the +1 Laplace
    # floor 8:1, so thin contexts don't pay a full uniform-mixing tax
    c = (counts.astype(jnp.int32) << 3) + 1
    # rescale so total < 2^16 (keeps c * (M - a) within int32): one direct
    # per-row shift, bit-length computed by compares (no floats — must be
    # bit-identical on every backend)
    tot = c.sum(-1, keepdims=True)
    shift = jnp.zeros_like(tot)
    for k in range(16, 31):  # tot is int32 (< 2^31)
        shift = shift + (tot >= (1 << k))
    c = jnp.maximum(c >> shift, 1)
    tot = c.sum(-1, keepdims=True)
    q = jnp.maximum(1, (c * (M - a)) // tot).astype(jnp.int32)
    deficit = M - q.sum(-1, keepdims=True)
    top = jnp.argmax(q, axis=-1)
    onehot = jax.nn.one_hot(top, a, dtype=jnp.int32)
    return q + onehot * deficit


def cum_from_freqs(freqs: jnp.ndarray) -> jnp.ndarray:
    """[..., A] freqs -> [..., A+1] cumulative (exclusive, cum[-1] = M)."""
    z = jnp.zeros(freqs.shape[:-1] + (1,), freqs.dtype)
    return jnp.concatenate([z, jnp.cumsum(freqs, axis=-1)], axis=-1)


# --------------------------------------------------------------------------
# Encoder core: reverse wavefront with precomputed (freq, cum)
# --------------------------------------------------------------------------

UNROLL = 8      # decode symbols per scan step (pair window = UNROLL//2+1)
ENC_UNROLL = 32  # encode symbols per scan step: larger chunks cut the
                 # carried-payload read/write traffic 4x (the dense
                 # accumulate streams [L, Wp] once per chunk); the payload
                 # FORMAT is unchanged — only nwords matter to decoders


def _div_u32(x, f):
    """Exact unsigned x // f via float reciprocal + correction (TPUs have no
    native integer division).  Valid for q = x // f < 2^24: the f32
    approximation is then off by at most 1, fixed branchlessly."""
    q = (x.astype(jnp.float32) * (1.0 / f.astype(jnp.float32))) \
        .astype(jnp.uint32)
    r = x - q * f                       # wraps (mod 2^32) if q overshot
    over = r >= np.uint32(1 << 31)      # q too big by 1
    q = jnp.where(over, q - np.uint32(1), q)
    r = jnp.where(over, r + f, r)
    under = r >= f                      # q too small by 1
    q = jnp.where(under, q + np.uint32(1), q)
    r = jnp.where(under, r - f, r)
    return q, r


def _enc_sym(x, f, c, a):
    """One rANS encode sub-step on [L] vectors."""
    do_emit = a & (x >= (f << _ENC_SHIFT))
    word = (x & _U16).astype(jnp.int32)
    x = jnp.where(do_emit, x >> np.uint32(16), x)
    q, r = _div_u32(x, f)
    xn = (q << np.uint32(PROB_BITS)) + c + r
    x = jnp.where(a, xn, x)
    return x, word, do_emit


def emit_chunk_pairs(payload, b, w8, le, wmax: int, unroll: int = UNROLL):
    """Merge one chunk's <= `unroll` renorm emissions into the paired payload.

    Local emission k occupies u16 slot wmax-1-(b+k); slots are first merged
    in-register into <= unroll//2+1 pair values, then accumulated into the
    carried payload with a DENSE one-hot masked add over the pair axis —
    measured 2.5 ns per touched slot on TPU vs 11.5 ns for an .at[].add
    scatter (random scatters serialize; dense compare+select chains stream
    at full VPU rate)."""
    wp = wmax // 2
    npair = unroll // 2 + 1
    ks = jnp.arange(unroll, dtype=jnp.int32)
    ws0 = wmax - 1 - b                        # [L] u16 slot of emission 0
    base = ws0 >> 1                           # [L] its pair index
    ws = ws0[:, None] - ks[None, :]           # [L, U]
    val = jnp.where((ws & 1) == 1, w8 << 16, w8)
    val = jnp.where(ks[None, :] < le[:, None], val, 0)
    pidx = ws >> 1
    pv = jnp.stack([(val * (pidx == (base - m)[:, None])).sum(1)
                    for m in range(npair)], 1)            # [L, npair]
    # dense accumulate: payload[l, w] += pv[l, base[l] - w] for the window
    wi = jnp.arange(wp, dtype=jnp.int32)
    m_idx = base[:, None] - wi[None, :]                   # [L, wp]
    add = jnp.zeros_like(payload)
    for m in range(npair):
        add = add + jnp.where(m_idx == m, pv[:, m:m + 1], 0)
    return payload + add


def extract_chunk_pairs(payload, base, npair: int):
    """pairs[l, m] = payload[l, base[l] + m] via dense masked sums (the
    decode mirror of emit_chunk_pairs; ~1 ns per touched slot vs ~20 ns for
    take_along_axis on TPU)."""
    wp = payload.shape[1]
    wi = jnp.arange(wp, dtype=jnp.int32)
    m_idx = wi[None, :] - base[:, None]                   # [L, wp]
    return jnp.stack(
        [jnp.sum(jnp.where(m_idx == m, payload, 0), axis=1)
         for m in range(npair)], 1)                       # [L, npair]


def rans_encode_from_freqs(
    freq: jnp.ndarray,      # [T, L] int32 (1..M-1), decode order
    cum: jnp.ndarray,       # [T, L] int32
    active: jnp.ndarray,    # [T, L] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (payload [L, Wp] i32 of u16 PAIRS, nwords [L] int32 in u16
    words, states [L] u32).

    The reverse wavefront processes UNROLL symbols per scan step and writes
    renorm words directly into a carried payload (per-symbol scatters cost
    ~7 ns on TPU and dominated the old two-pass pack).  Word layout: in the
    virtual u16 index space [0, 2*Wp), row j's words occupy
    [2*Wp - nwords[j], 2*Wp) in DECODE order; u16 index ws lives in pair
    ws >> 1, half ws & 1 (low half read first — matches a little-endian u16
    view of the i32 array, so host serialization is a reinterpret).  Pairing
    halves the elements decoders must gather per renorm word.
    """
    t_steps, l = freq.shape
    u = ENC_UNROLL
    tp = -(-t_steps // u) * u
    wmax = tp + u                 # u16 capacity (even)
    wp = wmax // 2                # pair capacity
    pad = ((0, tp - t_steps), (0, 0))
    f32 = jnp.pad(jnp.where(active, freq, 1), pad, constant_values=1) \
        .astype(jnp.uint32).reshape(-1, u, l)
    c32 = jnp.pad(cum, pad).astype(jnp.uint32).reshape(-1, u, l)
    act = jnp.pad(active, pad).reshape(-1, u, l)
    ks = jnp.arange(u, dtype=jnp.int32)

    def step(carry, inp):
        x, b, payload = carry
        f, c, a = inp
        # collect this chunk's emissions into a u-slot register block
        w8 = jnp.zeros((l, u), jnp.int32)
        le = jnp.zeros((l,), jnp.int32)
        for k in range(u - 1, -1, -1):
            x, w, e = _enc_sym(x, f[k], c[k], a[k])
            put = e[:, None] & (le[:, None] == ks[None, :])
            w8 = jnp.where(put, w[:, None], w8)
            le = le + e.astype(jnp.int32)
        payload = emit_chunk_pairs(payload, b, w8, le, wmax, unroll=u)
        return (x, b + le, payload), None

    x0 = jnp.full((l,), RANS_L, jnp.uint32)
    payload0 = jnp.zeros((l, wp), jnp.int32)
    (states, nwords, payload), _ = jax.lax.scan(
        step, (x0, jnp.zeros((l,), jnp.int32), payload0),
        (f32, c32, act), reverse=True)
    return payload, nwords, states


# --------------------------------------------------------------------------
# Decoder core: forward wavefront with a pluggable symbol model
# --------------------------------------------------------------------------

def rans_decode(
    payload: jnp.ndarray,    # [L, Wp] int32 pairs
    states: jnp.ndarray,     # [L] uint32
    lengths: jnp.ndarray,    # [L] int32
    t_steps: int,
    model_fn: Callable,      # (carry, slot_i32 [L], t, active) ->
                             #   (sym [L] i32, freq [L] i32, cum [L] i32, carry)
    model_carry,
    nwords=None,             # right-aligned payload: start at 2*Wp - nwords
):
    """Returns (syms [T, L] int32, final_states [L] u32, model_carry).
    payload is the paired layout from rans_encode_from_freqs.

    Chunked wavefront: each scan step decodes UNROLL symbols; the <= UNROLL
    renorm words those symbols can consume live in npf consecutive pairs,
    extracted once per chunk with dense masked sums (extract_chunk_pairs) —
    random per-symbol word gathers cost ~20 ns on TPU and dominated the old
    per-symbol loop."""
    l = payload.shape[0]
    npf = UNROLL // 2 + 1
    pk = jnp.arange(npf, dtype=jnp.int32)
    wptr0 = jnp.zeros((l,), jnp.int32) if nwords is None \
        else (2 * payload.shape[1] - nwords).astype(jnp.int32)
    chunks = max(1, -(-t_steps // UNROLL))

    def step(carry, tc):
        x, wptr, mc = carry
        pairs = extract_chunk_pairs(payload, wptr >> 1, npf)
        phase = wptr & 1
        o = jnp.zeros((l,), jnp.int32)
        syms = []
        for u in range(UNROLL):
            t = tc + u
            active = t < lengths
            slot = (x & _MASK).astype(jnp.int32)
            sym, f, c, mc = model_fn(mc, slot, t, active)
            fu = jnp.where(active, f, 1).astype(jnp.uint32)
            xn = fu * (x >> np.uint32(PROB_BITS)) + slot.astype(jnp.uint32) \
                - c.astype(jnp.uint32)
            need = active & (xn < RANS_L)
            lp = (phase + o) >> 1
            half = (phase + o) & 1
            p = jnp.sum(jnp.where(lp[:, None] == pk[None, :], pairs, 0),
                        axis=1)
            w = (jnp.where(half == 1, p >> 16, p) & 0xFFFF).astype(jnp.uint32)
            xn = jnp.where(need, (xn << np.uint32(16)) | w, xn)
            x = jnp.where(active, xn, x)
            o = o + need.astype(jnp.int32)
            syms.append(sym)
        return (x, wptr + o, mc), jnp.stack(syms)

    (x, _, mc), syms = jax.lax.scan(
        step, (states, wptr0, model_carry),
        jnp.arange(chunks, dtype=jnp.int32) * UNROLL)
    return syms.reshape(chunks * UNROLL, l)[:t_steps], x, mc


def symbol_from_slot(slot: jnp.ndarray, cumfull: jnp.ndarray, nsym: int):
    """Locate symbol for each lane given [..., A+1] cumulative table.

    cumfull may be [A+1] (uniform) or [L, A+1] (per-lane).  Returns
    (sym, freq, cum) as int32 [L].
    """
    if cumfull.ndim == 1:
        cumfull = cumfull[None, :]
    ge = (slot[:, None] >= cumfull[:, 1:nsym]).astype(jnp.int32)  # [L, A-1]
    sym = ge.sum(1)
    onehot = jax.nn.one_hot(sym, nsym, dtype=jnp.int32)           # [L, A]
    cum_lo = (onehot * cumfull[:, :nsym]).sum(1)
    cum_hi = (onehot * cumfull[:, 1:nsym + 1]).sum(1)
    return sym, cum_hi - cum_lo, cum_lo


# --------------------------------------------------------------------------
# Static order-0 codec
# --------------------------------------------------------------------------

def encode_order0(syms: jnp.ndarray, nsym: int, num_lanes: int):
    """Static order-0 coding of [n] symbols with a single shared table.

    Returns dict of device arrays + the quantized freqs (to transmit).
    """
    n = syms.shape[0]
    counts = jnp.zeros((nsym,), jnp.int32).at[syms].add(1, mode="drop")
    freqs = quantize_counts(counts)
    cumfull = cum_from_freqs(freqs)
    lanes = lane_split(syms.astype(jnp.int32), num_lanes)
    t_steps = lanes.shape[0]
    lengths = jnp.asarray(lane_lengths(n, num_lanes))
    active = lane_active(t_steps, lengths)
    f = freqs[lanes]
    c = cumfull[:-1][lanes]
    payload, nwords, states = rans_encode_from_freqs(f, c, active)
    return dict(payload=payload, nwords=nwords, states=states, freqs=freqs)


def decode_order0(payload, states, freqs, n: int, nsym: int, num_lanes: int,
                  nwords=None):
    cumfull = cum_from_freqs(freqs)
    lengths = jnp.asarray(lane_lengths(n, num_lanes))
    t_steps = -(-n // num_lanes) if n else 1

    def model(carry, slot, t, active):
        sym, f, c = symbol_from_slot(slot, cumfull, nsym)
        return sym, f, c, carry

    syms, _, _ = rans_decode(payload, states, lengths, t_steps, model, (),
                             nwords=nwords)
    return lane_merge(syms, n)


# --------------------------------------------------------------------------
# Adaptive EMA codec (division-free, constant-total integer model)
# --------------------------------------------------------------------------

EMA_RATE = 5  # adaptation rate: counts lose 1/2^r mass to the seen symbol


def ema_init(num_lanes: int, nsym: int) -> jnp.ndarray:
    base = M // nsym
    rem = M - base * nsym
    row = base + (jnp.arange(nsym) < rem).astype(jnp.int32)
    return jnp.broadcast_to(row, (num_lanes, nsym)).astype(jnp.int32)


def ema_update(counts: jnp.ndarray, sym: jnp.ndarray, active) -> jnp.ndarray:
    """counts [L, A] -> updated; total stays exactly M, entries stay >= 1."""
    dec = counts >> EMA_RATE
    newc = counts - dec
    deficit = dec.sum(1)
    onehot = jax.nn.one_hot(sym, counts.shape[1], dtype=jnp.int32)
    newc = newc + onehot * deficit[:, None]
    return jnp.where(active[:, None], newc, counts)


def encode_adaptive(syms: jnp.ndarray, nsym: int, num_lanes: int):
    """Adaptive-EMA order-0 coding; no tables are transmitted."""
    n = syms.shape[0]
    lanes = lane_split(syms.astype(jnp.int32), num_lanes)
    t_steps = lanes.shape[0]
    lengths = jnp.asarray(lane_lengths(n, num_lanes))
    active = lane_active(t_steps, lengths)

    def model_pass(counts, inp):
        s, a = inp
        cumf = cum_from_freqs(counts)
        onehot = jax.nn.one_hot(s, nsym, dtype=jnp.int32)
        f = (onehot * counts).sum(1)
        c = (onehot * cumf[:, :nsym]).sum(1)
        counts = ema_update(counts, s, a)
        return counts, (f, c)

    _, (f, c) = jax.lax.scan(model_pass, ema_init(num_lanes, nsym),
                             (lanes, active))
    payload, nwords, states = rans_encode_from_freqs(f, c, active)
    return dict(payload=payload, nwords=nwords, states=states)


def decode_adaptive(payload, states, n: int, nsym: int, num_lanes: int,
                    nwords=None):
    lengths = jnp.asarray(lane_lengths(n, num_lanes))
    t_steps = -(-n // num_lanes) if n else 1

    def model(counts, slot, t, active):
        cumf = cum_from_freqs(counts)
        sym, f, c = symbol_from_slot(slot, cumf, nsym)
        counts = ema_update(counts, sym, active)
        return sym, f, c, counts

    syms, _, _ = rans_decode(payload, states, lengths, t_steps, model,
                             ema_init(num_lanes, nsym), nwords=nwords)
    return lane_merge(syms, n)
