"""Multi-chip block-parallel compression over a jax.sharding.Mesh.

The reference's parallelism is block data-parallelism with ordered merge
(DataQueue.h / DsrcWorker.cpp, SURVEY.md §2.5).  The TPU-native equivalent
(SURVEY.md §5.8): blocks are sharded across devices along a 'blocks' mesh
axis, each device runs the full device-side compression pipeline on its
blocks, and only the tiny per-block *size* vector is all-gathered so every
host can compute archive offsets — payload bytes never cross chips; the
ordered merge of the reference's writer thread becomes offset arithmetic.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ctx as C
from ..ops import parser as PR
from ..ops import transform as T

BLOCK_AXIS = "blocks"


def _device_compress_one(block: jnp.ndarray, nbytes: jnp.ndarray,
                         rcap: int, num_lanes: int,
                         edges: Tuple[int, ...], dna_order: int):
    """Device-only compression pipeline for one block (fixed schemes:
    order-k DNA ctx coding + positional quality coding).  Returns fixed-shape
    payload tensors + byte counts; host-side serialization/scheme selection
    is layered on top in the streaming pipeline (models/block.py)."""
    cap = block.shape[0]
    parsed = PR.parse_block(block, nbytes, rcap)
    seqs, s_total, _ = PR.gather_stream(
        block, parsed.seq_start, parsed.seq_len, cap)
    quals, q_total, _ = PR.gather_stream(
        block, parsed.qual_start, parsed.qual_len, cap)
    active = jnp.arange(cap, dtype=jnp.int32) < s_total
    seq_sym = T.dna_remap(seqs)
    qv = jnp.clip(jnp.where(active, quals.astype(jnp.int32) - 33, 0), 0, 255)
    dna, dna_total, qual_out, _ = T.forward_lossless(seq_sym, qv, active)
    dna4 = jnp.clip(dna, 0, 3)
    enc_d = C.encode_orderk(dna4, dna_total, dna_order, 2, 4,
                            num_lanes, edges)
    # positional quality contexts from record lengths
    cum = jnp.cumsum(parsed.qual_len)
    idx = jnp.arange(cap, dtype=jnp.int32)
    rec_of = jnp.searchsorted(cum, idx, side="right").astype(jnp.int32)
    pos_of = idx - jnp.take(cum - parsed.qual_len, rec_of, mode="clip")
    ctx = jnp.minimum(pos_of, 255)
    lanes = C.lane_split(jnp.clip(qual_out, 0, 63), num_lanes)
    ctxl = C.lane_split(ctx, num_lanes)
    t_steps = lanes.shape[0]
    nn = jnp.asarray(q_total, jnp.int32)
    lstarts = jnp.minimum(
        jnp.arange(num_lanes, dtype=jnp.int32) * t_steps, nn)
    llen = jnp.minimum(lstarts + t_steps, nn) - lstarts
    act = C.lane_active(t_steps, llen)
    pq, nq, sq = C.encode_ctx_lanes(
        jnp.where(act, lanes, 0), act, jnp.where(act, ctxl, 0),
        256, 64, edges)
    dna_bytes = 2 * enc_d["nwords"].sum() + 4 * num_lanes
    qual_bytes = 2 * nq.sum() + 4 * num_lanes
    return dict(dna_payload=enc_d["payload"], dna_states=enc_d["states"],
                qual_payload=pq, qual_states=sq,
                comp_bytes=dna_bytes + qual_bytes,
                records=parsed.num_records)


def make_sharded_compress_step(mesh: Mesh, cap: int, rcap: int,
                               dna_order: int = 3):
    """jit a batched compress step with the block axis sharded over the mesh.

    Returns fn(blocks [B, cap] uint8, nbytes [B] int32) ->
      (comp_bytes [B], offsets [B], payload pytree); offsets come from a
      cross-device cumulative sum of the gathered size vector (the 'ordered
      merge' collective).
    """
    num_lanes = C.pick_num_lanes(cap)
    edges = C.band_edges(-(-cap // num_lanes))
    block_sharding = NamedSharding(mesh, P(BLOCK_AXIS, None))
    vec_sharding = NamedSharding(mesh, P(BLOCK_AXIS))
    rep = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(block_sharding, vec_sharding),
        out_shardings=(rep, rep, NamedSharding(mesh, P(BLOCK_AXIS))),
    )
    def step(blocks, nbytes):
        out = jax.vmap(lambda b, n: _device_compress_one(
            b, n, rcap, num_lanes, edges, dna_order))(blocks, nbytes)
        sizes = out["comp_bytes"]              # [B] — tiny; all-gathered
        offsets = jnp.cumsum(sizes) - sizes    # archive offset arithmetic
        return sizes, offsets, out["qual_payload"]

    return step


def dryrun(n_devices: int, cap: int = 8192, rcap: int = 128) -> None:
    """Compile + execute one sharded multi-block compress step on an
    n_devices mesh (driver validation hook; also used by tests on the
    virtual CPU mesh)."""
    from ..utils.synth import make_fastq
    devs = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devs, (BLOCK_AXIS,))
    B = n_devices * 2
    blocks = np.zeros((B, cap), np.uint8)
    nbytes = np.zeros((B,), np.int32)
    for i in range(B):
        data = np.frombuffer(
            make_fastq(24, 40, seed=i, title_style="plain"), np.uint8)
        blocks[i, :len(data)] = data
        nbytes[i] = len(data)
    step = make_sharded_compress_step(mesh, cap, rcap)
    sizes, offsets, payload = step(jnp.asarray(blocks), jnp.asarray(nbytes))
    jax.block_until_ready((sizes, offsets, payload))
    assert sizes.shape == (B,)
    assert bool((np.asarray(sizes) > 0).all())
