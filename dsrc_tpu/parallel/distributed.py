"""Multi-host whole-file compression driver (SURVEY §5.8).

Each `jax.distributed` process compresses an interleaved subset of the
file's blocks (block i belongs to process i mod N) with the SAME block
boundaries, dataset analysis, and hint seeding a single-process run uses,
so the archive is byte-identical to `DsrcModule.compress`.  The only
cross-process values are the per-block (size, record-count) vectors — an
all-gather — from which every process computes its blocks' archive
offsets and writes them into the shared output file; process 0 then
writes the footer + header (the reference's ordered writer thread,
DsrcOperator.cpp:230-340 / DsrcIo.cpp:19-89, re-expressed as offset
arithmetic, like the single-host mesh codec in parallel/mesh.py).

Requires `jax.distributed.initialize()` to have been called and the
output path to be on a filesystem all processes share.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config import DsrcException, InputParameters
from ..io.archive import HEADER_SIZE, finalize_archive
from ..io.chunker import FastqChunker
from ..models.block import BlockCodec, BlockShape


def compress_distributed(fastq_path: str, dsrc_path: str,
                         params: Optional[InputParameters] = None) -> None:
    """Compress `fastq_path` into `dsrc_path` across all jax.distributed
    processes.  Byte-identical to the single-process archive."""
    import jax
    from jax.experimental import multihost_utils

    pid = jax.process_index()
    nproc = jax.process_count()
    params = params or InputParameters()
    settings = params.to_settings()
    block_size = params.fastq_block_size_bytes or \
        (params.fastq_block_size_mb << 20)
    shape = BlockShape.for_block_size(block_size)

    # Every process runs the same sequential record-aligned chunk scan
    # (newline counting, not compression), keeping only its own blocks —
    # block boundaries therefore match the single-process chunker exactly.
    from ..api import analyze_first_block, _count_records
    my_blocks = {}
    nrecs = []
    with open(fastq_path, "rb") as src:
        chunker = FastqChunker(src, block_size)
        i = 0
        first = None
        while True:
            block = chunker.next_block()
            if block is None:
                break
            if len(block) > shape.cap:
                raise DsrcException(
                    "FASTQ record larger than the block size; "
                    "increase the block size (-b)")
            if i == 0:
                first = block
            nrecs.append(_count_records(block))
            if i % nproc == pid:
                my_blocks[i] = np.array(block)   # own a copy
            i += 1
    if first is None:
        raise DsrcException("empty FASTQ input")
    nblocks = len(nrecs)

    dataset = analyze_first_block(first, shape, params.quality_offset)
    codec = BlockCodec(shape, settings, dataset)
    # identical hint seeding on every process (single-process equivalence)
    codec.seed_semi_hints(first)

    sizes = np.zeros(nblocks, np.int64)
    blobs = {}
    for i in sorted(my_blocks):
        blob, _info = codec.compress(my_blocks[i])
        blobs[i] = blob
        sizes[i] = len(blob)

    # the ordered-merge collective: one all-gather of disjoint size
    # vectors; every process then knows every block's archive offset
    gathered = multihost_utils.process_allgather(sizes)
    all_sizes = gathered.sum(axis=0).astype(np.int64)
    offsets = HEADER_SIZE + np.concatenate(
        [[0], np.cumsum(all_sizes)[:-1]])

    if pid == 0:
        with open(dsrc_path, "wb") as f:
            f.truncate(HEADER_SIZE + int(all_sizes.sum()))
    multihost_utils.sync_global_devices("dsrc_tpu:archive_created")

    with open(dsrc_path, "r+b") as f:
        for i, blob in blobs.items():
            f.seek(int(offsets[i]))
            f.write(blob)
    multihost_utils.sync_global_devices("dsrc_tpu:blocks_written")

    if pid == 0:
        with open(dsrc_path, "r+b") as f:
            f.seek(HEADER_SIZE + int(all_sizes.sum()))
            finalize_archive(f, settings, dataset, block_size,
                             list(zip(all_sizes.tolist(), nrecs)))
    multihost_utils.sync_global_devices("dsrc_tpu:finalized")
