"""Synthetic FASTQ generation for tests and benchmarks.

Produces the three platform styles the reference supports (README.md:5-13):
Illumina (fixed-length, offset 33 or 64), 454/IonTorrent (variable-length,
offset 33), SOLiD (color-space, primer base + digits).  Statistics are shaped
to resemble real data: positional quality decay, correlated DNA (order-2
Markov), occasional N bases with low quality.
"""
from __future__ import annotations

import numpy as np

_DNA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _markov_dna(rng: np.random.Generator, n: int) -> np.ndarray:
    """Order-1 Markov chain over ACGT with a skewed transition matrix."""
    trans = rng.dirichlet(np.full(4, 0.5), size=4).astype(np.float32)
    cum = np.cumsum(trans, axis=1)
    u = rng.random(n, dtype=np.float32)
    out = np.empty(n, dtype=np.int64)
    state = int(rng.integers(4))
    # vectorized-ish: process in chunks via searchsorted per step is slow;
    # for test sizes this python loop over chunks is fine.
    for i in range(n):
        state = int(np.searchsorted(cum[state], u[i]))
        state = min(state, 3)
        out[i] = state
    return out


def _fast_dna(rng: np.random.Generator, n: int) -> np.ndarray:
    """Skewed iid DNA (fast path for large benchmark files)."""
    p = np.array([0.30, 0.21, 0.20, 0.29])
    # rng.choice(p=...) is ~20x slower than inverse-CDF via searchsorted
    u = rng.random(n, dtype=np.float32)
    return np.minimum(np.searchsorted(np.cumsum(p), u), 3).astype(np.int64)


def make_fastq_fast(num_records: int, read_len: int, *,
                    quality_offset: int = 33, seed: int = 0,
                    fixed_width: bool = False,
                    quality_levels=None) -> bytes:
    """Fully vectorized Illumina-style generator for large benchmark files
    (no per-record Python loop).  fixed_width zero-pads numeric title fields
    so every record has identical byte length (uniform-block benches).
    quality_levels: optional ascending tuple of quality VALUES — each
    sample is rounded down to the nearest level, emulating binned quality
    platforms (NovaSeq RTA3 uses 4 levels, e.g. (2, 12, 23, 37))."""
    rng = np.random.default_rng(seed)
    total = num_records * read_len
    seq = _DNA[_fast_dna(rng, total)].reshape(num_records, read_len)
    pos = np.arange(read_len)
    qmean = 38.0 - 14.0 * (pos / read_len) ** 2
    qual = np.clip(qmean[None, :] + rng.normal(0, 3.0, (num_records,
                                                        read_len)),
                   0, 41).astype(np.uint8)
    if quality_levels is not None:
        lv = np.asarray(sorted(quality_levels), np.uint8)
        qual = lv[np.maximum(
            np.searchsorted(lv, qual, side="right") - 1, 0)]
    qual = qual + quality_offset
    # titles: "@SIM001.<i> INSTR:<a>:<b>:<x>:<y> length=<L>"
    i = np.arange(1, num_records + 1)

    def num(x, width):
        s = x.astype(f"U{width}")
        return np.char.zfill(s, width) if fixed_width else s

    cols = [np.char.add("@SIM001.", num(i, 9)),
            np.char.add(" INSTR:", num(1 + i % 4, 2)),
            np.char.add(":", num(i % 100, 3)),
            np.char.add(":", num(1000 + i * 7 % 9000, 5)),
            np.char.add(":", num(2000 + i * 13 % 9000, 5)),
            np.full(num_records, f" length={read_len}", dtype="U12")]
    titles = cols[0]
    for c in cols[1:]:
        titles = np.char.add(titles, c)
    tl = np.char.str_len(titles).astype(np.int64)
    maxw = int(tl.max())
    tmat = titles.astype(f"U{maxw}").view(np.uint32).reshape(
        num_records, maxw).astype(np.uint8)
    rec_len = tl + 1 + read_len + 1 + 1 + 1 + read_len + 1
    starts = np.concatenate([[0], np.cumsum(rec_len)[:-1]])
    out = np.zeros(int(rec_len.sum()), np.uint8)
    # scatter titles
    reps = np.repeat(np.arange(num_records), tl)
    offs = np.concatenate([[0], np.cumsum(tl)[:-1]])
    within = np.arange(int(tl.sum())) - offs[reps]
    out[starts[reps] + within] = tmat[
        np.arange(num_records).repeat(tl), within]
    nl1 = starts + tl
    out[nl1] = 10
    sq = nl1 + 1
    cols_r = np.arange(read_len)
    out[(sq[:, None] + cols_r[None, :]).ravel()] = seq.ravel()
    nl2 = sq + read_len
    out[nl2] = 10
    out[nl2 + 1] = ord("+")
    out[nl2 + 2] = 10
    qd = nl2 + 3
    out[(qd[:, None] + cols_r[None, :]).ravel()] = qual.ravel()
    out[qd + read_len] = 10
    return out.tobytes()


def make_fastq_realistic(num_records: int, read_len: int = 100, *,
                         platform: str = "hiseq", seed: int = 0) -> bytes:
    """Illumina-style FASTQ with MEASURED-realism statistics (VERDICT r4
    #5: the plain generators are near-iid, which flatters static
    positional tables).  Models, all vectorized:

      * quality: per-cycle mean decay + AR(1) within-read correlation
        (rho 0.6, like real base callers' local error bursts), a per-READ
        quality shift (a few % of reads are globally bad), low-quality
        dips after error events, 3' degradation; 'novaseq' bins to the 4
        RTA3 levels (2, 12, 23, 37)
      * DNA: order-2 Markov chain with GC bias, homopolymer stretch bias,
        ~0.2% N with quality 2, one instrument "bad cycle" where many
        reads carry N, and 1% of reads ending in an adapter motif
      * titles: the real 7-field Illumina grammar
        "@<instr>:<run>:<flowcell>:<lane>:<tile>:<x>:<y> <r>:N:0:<index>"
        with tile-sorted records and jittered coordinates (digit counts
        vary -> the semi/tokenized path, like real files)
    """
    rng = np.random.default_rng(seed)
    R, L = num_records, read_len

    # ---- quality: AR(1) around a decaying per-cycle mean
    pos = np.arange(L)
    qmean = 37.5 - 3.0 * (pos / L) ** 1.5 - 9.0 * (pos / L) ** 6
    read_shift = np.where(rng.random(R) < 0.04,
                          rng.normal(-12.0, 4.0, R),
                          rng.normal(0.0, 1.5, R))
    rho, sig = 0.6, 2.8
    eps = rng.normal(0.0, sig, (R, L))
    ar = np.empty((R, L), np.float32)
    ar[:, 0] = eps[:, 0]
    for j in range(1, L):
        ar[:, j] = rho * ar[:, j - 1] + eps[:, j]
    # error-event dips: rare strong negative spikes that decay over ~6 bp
    spikes = (rng.random((R, L)) < 0.004) * rng.normal(-20.0, 5.0, (R, L))
    for j in range(1, L):
        spikes[:, j] = np.minimum(spikes[:, j], 0.7 * spikes[:, j - 1])
    q = qmean[None, :] + read_shift[:, None] + ar + spikes
    qual = np.clip(q, 2, 41).astype(np.uint8)
    if platform == "novaseq":
        lv = np.array([2, 12, 23, 37], np.uint8)
        qual = lv[np.maximum(np.searchsorted(lv, qual, side="right") - 1,
                             0)]

    # ---- DNA: order-2 Markov with GC bias + homopolymer stickiness
    trans = rng.dirichlet(np.full(4, 0.8), size=16).astype(np.float32)
    trans = 0.8 * trans + 0.2 * np.array([0.3, 0.2, 0.2, 0.3],
                                         np.float32)[None, :]
    for c in range(16):
        trans[c, c & 3] += 0.15            # homopolymer bias
    trans /= trans.sum(1, keepdims=True)
    cumt = np.cumsum(trans, axis=1)
    base = np.empty((R, L), np.int64)
    state = rng.integers(0, 16, R)
    u = rng.random((R, L), dtype=np.float32)
    rows = np.arange(R)
    for j in range(L):
        row = cumt[state]
        b = (u[:, j, None] >= row).sum(1)
        b = np.minimum(b, 3)
        base[:, j] = b
        state = ((state << 2) | b) & 15
    seq = _DNA[base]
    # adapter read-through on ~1% of reads (shared motif at the 3' end)
    adapter = np.frombuffer(b"AGATCGGAAGAGC", np.uint8)
    n_ad = max(1, R // 100)
    ad_rows = rng.choice(R, n_ad, replace=False)
    ad_start = rng.integers(max(1, L - 40), max(2, L - 5), n_ad)
    for r, s in zip(ad_rows, ad_start):      # few rows: loop is fine
        k = min(len(adapter), L - s)
        seq[r, s:s + k] = adapter[:k]
    # sparse N + one instrument bad cycle
    nm = rng.random((R, L)) < 0.002
    bad_cycle = int(rng.integers(L // 3, L))
    nm[rng.random(R) < 0.3, bad_cycle] = True
    seq[nm] = ord("N")
    qual[nm] = 2
    qual_b = qual + 33

    # ---- titles: real Illumina 7-field grammar, tile-sorted
    instr = "A00953"
    run, fc = 417, "HJCMKDSX7"
    lanes = 1 + (np.arange(R) * 4) // R
    tiles = 1101 + ((np.arange(R) * 96) // R) % 96
    x = np.sort(rng.integers(1000, 32000, R)) \
        if R else np.zeros(0, np.int64)
    x = x + rng.integers(-50, 50, R)         # near-sorted, like tile order
    y = rng.integers(1000, 37000, R)
    idx7 = "TTAGGCAT"
    titles = np.char.add(
        np.char.add(
            np.char.add(f"@{instr}:{run}:{fc}:",
                        np.char.add(lanes.astype("U1"), ":")),
            np.char.add(tiles.astype("U4"), ":")),
        np.char.add(np.char.add(x.astype("U5"), ":"),
                    np.char.add(y.astype("U5"),
                                f" 1:N:0:{idx7}")))
    tl = np.char.str_len(titles).astype(np.int64)
    maxw = int(tl.max())
    tmat = titles.astype(f"U{maxw}").view(np.uint32).reshape(
        R, maxw).astype(np.uint8)
    rec_len = tl + 1 + L + 1 + 1 + 1 + L + 1
    starts = np.concatenate([[0], np.cumsum(rec_len)[:-1]])
    out = np.zeros(int(rec_len.sum()), np.uint8)
    reps = np.repeat(np.arange(R), tl)
    offs = np.concatenate([[0], np.cumsum(tl)[:-1]])
    within = np.arange(int(tl.sum())) - offs[reps]
    out[starts[reps] + within] = tmat[np.arange(R).repeat(tl), within]
    nl1 = starts + tl
    out[nl1] = 10
    sq = nl1 + 1
    cols_r = np.arange(L)
    out[(sq[:, None] + cols_r[None, :]).ravel()] = seq.ravel()
    nl2 = sq + L
    out[nl2] = 10
    out[nl2 + 1] = ord("+")
    out[nl2 + 2] = 10
    qd = nl2 + 3
    out[(qd[:, None] + cols_r[None, :]).ravel()] = qual_b.ravel()
    out[qd + L] = 10
    return out.tobytes()


def make_fastq(
    num_records: int = 1000,
    read_len: int = 100,
    *,
    variable_length: bool = False,
    quality_offset: int = 33,
    plus_repetition: bool = False,
    color_space: bool = False,
    n_base_prob: float = 0.003,
    iupac_prob: float = 0.0,
    title_style: str = "illumina",
    seed: int = 0,
    markov: bool = False,
    line_sep: bytes = b"\n",
) -> bytes:
    """Generate a synthetic FASTQ file as bytes."""
    rng = np.random.default_rng(seed)
    if variable_length:
        lens = rng.integers(max(20, read_len // 3), read_len + 1,
                            size=num_records)
    else:
        lens = np.full(num_records, read_len, dtype=np.int64)
    total = int(lens.sum())

    base_idx = (_markov_dna if markov else _fast_dna)(rng, total)
    # positional quality decay + noise
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.arange(total) - np.repeat(starts, lens)
    qmean = 38.0 - 14.0 * (pos / max(1, read_len)) ** 2
    qual = np.clip(
        qmean + rng.normal(0, 3.0, size=total), 0, 41).astype(np.int64)
    # N bases get low quality
    n_mask = rng.random(total) < n_base_prob
    qual[n_mask] = rng.integers(0, 3, size=int(n_mask.sum()))

    seq = _DNA[base_idx]
    seq[n_mask] = ord("N")
    if iupac_prob:
        # IUPAC ambiguity codes (reference 19-symbol alphabet,
        # RecordsProcessor.cpp:187-206) with quality < 7 so they take the
        # ambiguity-folding path — the reference binary CORRUPTS ambiguity
        # codes at quality >= 7 (verified r2; our engine handles both, see
        # test_iupac_high_quality_reference_defect)
        iupac = np.frombuffer(b"RWSKMDVHBY", dtype=np.uint8)
        i_mask = (rng.random(total) < iupac_prob) & ~n_mask
        seq[i_mask] = iupac[rng.integers(0, len(iupac),
                                         int(i_mask.sum()))]
        qual[i_mask] = rng.integers(0, 7, size=int(i_mask.sum()))
    qual_bytes = (qual + quality_offset).astype(np.uint8)

    if color_space:
        # SOLiD: primer base then digits 0-3 (+ '.' for unknown)
        digits = np.frombuffer(b"0123", dtype=np.uint8)
        seq = digits[base_idx]
        seq[n_mask] = ord(".")

    out = bytearray()
    off = 0
    for r in range(num_records):
        L = int(lens[r])
        if title_style == "illumina":
            title = (f"@SIM001.{r + 1} INSTR:{1 + r % 4}:{r % 100}:"
                     f"{1000 + r * 7 % 9000}:{2000 + r * 13 % 9000}"
                     f" length={L}").encode()
        elif title_style == "sra454":
            title = (f"@SRR000{r % 10}.{r + 1} "
                     f"E{r % 7}QRS{r % 100:02d} length={L}").encode()
        else:
            title = f"@read_{r}".encode()
        out += title + line_sep
        if color_space:
            out += b"T"  # primer base
        out += seq[off:off + L].tobytes() + line_sep
        out += (b"+" + title[1:] if plus_repetition else b"+") + line_sep
        out += qual_bytes[off:off + L].tobytes() + line_sep
        off += L
    return bytes(out)
