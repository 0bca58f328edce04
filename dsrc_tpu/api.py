"""Whole-file library API — the counterpart of the reference's
`dsrc::lib::DsrcModule` (DsrcModule.h:22, DsrcModule.cpp:47-91) and the
Configurable property surface (Configurable.h:45-90).

`DsrcModule.compress/decompress` drive the full pipeline:
chunker → first-block dataset analysis → BlockCodec → archive, mirroring the
operator drivers (DsrcOperator.cpp:47-228) with the parallel runtime in
parallel/pipeline.py.
"""
from __future__ import annotations

import functools
import itertools
from typing import BinaryIO, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import (AUTO_QUALITY_OFFSET, DatasetType, DsrcException,
                     FieldMask, InputParameters)
from .io.archive import ArchiveReader, ArchiveWriter
from .io.chunker import FastqChunker
from .models.block import BlockCodec, BlockShape, StreamsInfo
from .ops import parser as P
from .parallel.pipeline import ordered_parallel_map


@functools.partial(jax.jit, static_argnames=("rcap",))
def _analyze_jit(data, nbytes, rcap: int):
    parsed = P.parse_block(data, nbytes, rcap)
    return parsed.valid, P.analyze_block(data, parsed)


def analyze_first_block(block: np.ndarray, shape: BlockShape,
                        forced_offset: int = AUTO_QUALITY_OFFSET
                        ) -> DatasetType:
    """Dataset-type detection from the first chunk (reference
    FastqReader::AnalyzeFirstChunk, FastqIo.cpp:26-44)."""
    data = jnp.asarray(np.pad(np.asarray(block, np.uint8),
                              (0, shape.cap - len(block))))
    valid, d = _analyze_jit(data, jnp.int32(len(block)), shape.rcap)
    if not bool(valid):
        raise DsrcException("Error analyzing FASTQ dataset")
    if not bool(d["plus_consistent"]):
        raise DsrcException("Error analyzing FASTQ dataset "
                            "(inconsistent '+' lines)")
    offset = forced_offset if forced_offset != AUTO_QUALITY_OFFSET \
        else int(d["quality_offset"])
    return DatasetType(quality_offset=offset,
                      plus_repetition=bool(d["plus_repetition"]),
                      color_space=bool(d["color_space"]))


class DsrcModule:
    """Whole-file compress/decompress with reference-equivalent knobs."""

    def __init__(self, params: Optional[InputParameters] = None):
        self.params = params or InputParameters()

    # ---- Configurable-style properties (Configurable.h:45-90)
    @property
    def dna_compression_level(self) -> int:
        return self.params.dna_compression_level

    @dna_compression_level.setter
    def dna_compression_level(self, v: int) -> None:
        self.params.dna_compression_level = v
        self.params.validate()

    @property
    def quality_compression_level(self) -> int:
        return self.params.quality_compression_level

    @quality_compression_level.setter
    def quality_compression_level(self, v: int) -> None:
        self.params.quality_compression_level = v
        self.params.validate()

    @property
    def lossy_quality(self) -> bool:
        return self.params.lossy_quality

    @lossy_quality.setter
    def lossy_quality(self, v: bool) -> None:
        self.params.lossy_quality = bool(v)

    @property
    def fastq_buffer_size_mb(self) -> int:
        return self.params.fastq_block_size_mb

    @fastq_buffer_size_mb.setter
    def fastq_buffer_size_mb(self, v: int) -> None:
        self.params.fastq_block_size_mb = int(v)
        self.params.validate()

    @property
    def crc32_checking(self) -> bool:
        return self.params.calculate_crc32

    @crc32_checking.setter
    def crc32_checking(self, v: bool) -> None:
        self.params.calculate_crc32 = bool(v)

    @property
    def tag_field_filter_mask(self) -> int:
        return self.params.tag_preserve_mask

    @tag_field_filter_mask.setter
    def tag_field_filter_mask(self, mask: Union[int, FieldMask]) -> None:
        self.params.tag_preserve_mask = (
            mask.mask if isinstance(mask, FieldMask) else int(mask))

    @property
    def quality_offset(self) -> int:
        return self.params.quality_offset

    @quality_offset.setter
    def quality_offset(self, v: int) -> None:
        self.params.quality_offset = int(v)
        self.params.validate()

    # ---- whole-file operations
    def compress(self, fastq_path: Union[str, BinaryIO],
                 dsrc_path: Union[str, BinaryIO]) -> StreamsInfo:
        params = self.params
        settings = params.to_settings()
        block_size = params.fastq_block_size_bytes or \
            (params.fastq_block_size_mb << 20)
        shape = BlockShape.for_block_size(block_size)
        own_in = isinstance(fastq_path, str)
        src = open(fastq_path, "rb") if own_in else fastq_path
        info_total = StreamsInfo()
        try:
            chunker = FastqChunker(src, block_size)
            first = chunker.next_block()
            if first is None:
                raise DsrcException("empty FASTQ input")
            dataset = analyze_first_block(first, shape,
                                          params.quality_offset)
            codec = BlockCodec(shape, settings, dataset)
            writer = ArchiveWriter(dsrc_path, settings, dataset, block_size)

            def check(block):
                if len(block) > shape.cap:
                    raise DsrcException(
                        "FASTQ record larger than the block size; "
                        "increase the block size (-b)")
                return block

            def rest():
                block = chunker.next_block()
                while block is not None:
                    yield check(block)
                    block = chunker.next_block()

            def job(block):
                blob, info = codec.compress(block)
                if settings.calculate_crc32 and \
                        not codec.verify_checksum(blob):
                    raise DsrcException("CRC32 verification failed "
                                        "while compressing")
                return blob, _count_records(block), info

            workers = params.num_workers or 2
            # block 0 runs synchronously: it compiles/warms every kernel, so
            # worker threads never race on first-compile
            head = [job(check(first))]
            if workers > 1:
                results = itertools.chain(
                    head, ordered_parallel_map(rest(), job, workers))
            else:
                results = itertools.chain(head, map(job, rest()))
            for blob, nrec, info in results:
                writer.write_block(blob, nrec)
                info_total.add(info)
            writer.finish()
        finally:
            if own_in:
                src.close()
        return info_total

    def decompress(self, dsrc_path: Union[str, BinaryIO],
                   fastq_path: Union[str, BinaryIO]) -> None:
        reader = ArchiveReader(dsrc_path)
        shape = BlockShape.for_block_size(reader.block_size_bytes)
        codec = BlockCodec(shape, reader.settings, reader.dataset)
        own_out = isinstance(fastq_path, str)
        dst = open(fastq_path, "wb") if own_out else fastq_path
        try:
            workers = self.params.num_workers or 2
            blobs = iter(reader)
            head = [codec.decompress(b) for b in
                    itertools.islice(blobs, 1)]    # warm kernels in-line
            if workers > 1:
                texts = itertools.chain(
                    head, ordered_parallel_map(blobs, codec.decompress,
                                               workers))
            else:
                texts = itertools.chain(head, map(codec.decompress, blobs))
            for text in texts:
                dst.write(text.tobytes())
        finally:
            if own_out:
                dst.close()
            reader.close()


def _count_records(block: np.ndarray) -> int:
    return int(np.count_nonzero(block == 10)) // 4


def compress(fastq_path, dsrc_path, **kwargs) -> StreamsInfo:
    """One-shot convenience: dsrc_tpu.compress("in.fastq", "out.xfqz")."""
    return DsrcModule(InputParameters(**kwargs)).compress(fastq_path,
                                                          dsrc_path)


def decompress(dsrc_path, fastq_path) -> None:
    """One-shot convenience: dsrc_tpu.decompress("in.xfqz", "out.fastq")."""
    DsrcModule().decompress(dsrc_path, fastq_path)
