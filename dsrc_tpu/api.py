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
import threading
import time
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


class StageTimes:
    """Per-stage wall-clock + byte accounting for the whole-file pipeline
    (SURVEY.md §5.1 build note: the reference only reports byte totals,
    DsrcOperator.cpp:362-375; we add per-stage MB/s).  Thread-safe: worker
    threads accumulate concurrently, so per-stage seconds are summed CPU
    time across workers, not elapsed wall time."""

    STAGES = ("read", "codec", "write")

    def __init__(self):
        self.seconds = {s: 0.0 for s in self.STAGES}
        self.bytes = {s: 0 for s in self.STAGES}
        self._lock = threading.Lock()

    def add(self, stage: str, dt: float, nbytes: int = 0) -> None:
        with self._lock:
            self.seconds[stage] += dt
            self.bytes[stage] += nbytes

    def lines(self):
        for s in self.STAGES:
            sec = self.seconds[s]
            mb = self.bytes[s] / (1 << 20)
            rate = mb / sec if sec > 1e-9 else 0.0
            yield (f"{s:8s} {sec:8.2f} s  {mb:10.1f} MB  "
                   f"{rate:10.1f} MB/s")


class DsrcModule:
    """Whole-file compress/decompress with reference-equivalent knobs."""

    def __init__(self, params: Optional[InputParameters] = None):
        self.params = params or InputParameters()
        #: per-stage timing of the most recent compress/decompress call
        self.last_stage_times: Optional[StageTimes] = None

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
                 dsrc_path: Union[str, BinaryIO],
                 distributed: bool = False) -> StreamsInfo:
        if distributed:
            # multi-host driver (SURVEY §5.8): every jax.distributed
            # process compresses an interleaved block subset and writes
            # at computed offsets; archive is byte-identical to the
            # single-process run (parallel/distributed.py)
            from .parallel.distributed import compress_distributed
            if not (isinstance(fastq_path, str)
                    and isinstance(dsrc_path, str)):
                raise DsrcException(
                    "distributed compression requires file paths on a "
                    "shared filesystem")
            compress_distributed(fastq_path, dsrc_path, self.params)
            return StreamsInfo()
        params = self.params
        settings = params.to_settings()
        block_size = params.fastq_block_size_bytes or \
            (params.fastq_block_size_mb << 20)
        shape = BlockShape.for_block_size(block_size)
        own_in = isinstance(fastq_path, str)
        src = open(fastq_path, "rb") if own_in else fastq_path
        info_total = StreamsInfo()
        times = self.last_stage_times = StageTimes()
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
                while True:
                    t0 = time.perf_counter()
                    block = chunker.next_block()
                    times.add("read", time.perf_counter() - t0,
                              0 if block is None else len(block))
                    if block is None:
                        return
                    yield check(block)

            def job(block):
                t0 = time.perf_counter()
                blob, info = codec.compress(block)
                if settings.calculate_crc32 and \
                        not codec.verify_checksum(blob):
                    raise DsrcException("CRC32 verification failed "
                                        "while compressing")
                times.add("codec", time.perf_counter() - t0, len(block))
                return blob, _count_records(block), info

            all_blocks = itertools.chain([check(first)], rest())
            results = None
            # multi-chip path only when the first block is a fast-path
            # class (uniform or tokenized-semi); otherwise keep the
            # threaded generic pipeline
            if codec._uniform_eligible() and (
                    _host_stage_uniform(first, shape.cap) is not None
                    or codec.stage_semi_tok_for_mesh(first) is not None):
                mesh_results = _mesh_compress_results(all_blocks, codec, job)
                if mesh_results is not None:
                    results = mesh_results
            if results is None:
                workers = params.num_workers or 2
                # block 0 runs synchronously: it compiles/warms every
                # kernel, so worker threads never race on first-compile
                head = [job(next(all_blocks))]
                if workers > 1:
                    results = itertools.chain(
                        head, ordered_parallel_map(all_blocks, job, workers))
                else:
                    results = itertools.chain(head, map(job, all_blocks))
            for blob, nrec, info in results:
                t0 = time.perf_counter()
                writer.write_block(blob, nrec)
                times.add("write", time.perf_counter() - t0, len(blob))
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
        times = self.last_stage_times = StageTimes()
        try:
            from .models.block import BLOCK_SEMI, BLOCK_UNIFORM

            def read_blobs():
                while True:
                    t0 = time.perf_counter()
                    blob = next(reader_iter, None)
                    times.add("read", time.perf_counter() - t0,
                              0 if blob is None else len(blob))
                    if blob is None:
                        return
                    yield blob

            reader_iter = iter(reader)
            blobs = read_blobs()
            head_blob = next(blobs, None)
            if head_blob is not None:
                blobs = itertools.chain([head_blob], blobs)
            def decode(blob):
                t0 = time.perf_counter()
                text = codec.decompress(blob)
                times.add("codec", time.perf_counter() - t0, text.nbytes)
                return text

            texts = None
            if head_blob is not None and head_blob[:1] in (
                    bytes([BLOCK_UNIFORM]), bytes([BLOCK_SEMI])):
                texts = _mesh_decompress_results(blobs, codec)
            if texts is None:
                workers = self.params.num_workers or 2
                head = [decode(b) for b in
                        itertools.islice(blobs, 1)]   # warm kernels in-line
                if workers > 1:
                    texts = itertools.chain(
                        head, ordered_parallel_map(blobs, decode, workers))
                else:
                    texts = itertools.chain(head, map(decode, blobs))
            for text in texts:
                t0 = time.perf_counter()
                dst.write(text.tobytes())
                times.add("write", time.perf_counter() - t0, text.nbytes)
        finally:
            if own_out:
                dst.close()
            reader.close()


def _count_records(block: np.ndarray) -> int:
    return int(np.count_nonzero(block == 10)) // 4


# ---------------------------------------------------------------------------
# Multi-chip paths: blocks sharded one-per-device over a 'blocks' mesh
# (reference L4 block data-parallelism, DsrcOperator.cpp:230-340, re-expressed
# as sharded batch steps — see parallel/mesh.py)
# ---------------------------------------------------------------------------

def _host_stage_uniform(block: np.ndarray, cap: int = 0):
    """Host-only staging: (mat [rpad, rec_bytes], num_rec, spec, rpad) or
    None.  The uniformity predicate itself runs on-device inside the mesh
    step (MeshUniformCodec), so this only checks the cheap layout facts.
    cap pins the file-wide lane bucket (same rule as the single-chip
    codec, models/block.py:stage_uniform_block), so the tail block stays
    in the sharded batch instead of forcing a second compile."""
    from .parallel import uniform_pipeline as UP
    from .models.block import _rpad_bucket
    spec = UP.detect_spec(bytes(block[:4096]))
    if spec is None or len(block) % spec.rec_bytes:
        return None
    num_rec = len(block) // spec.rec_bytes
    rpad = _rpad_bucket(max(num_rec, cap // spec.rec_bytes))
    mat = np.zeros((rpad, spec.rec_bytes), np.uint8)
    mat[:num_rec] = np.asarray(block).reshape(num_rec, spec.rec_bytes)
    return mat, num_rec, spec, rpad


def _mesh_compress_results(blocks_iter, codec: BlockCodec, job):
    """Generator of (blob, nrec, info) compressing uniform AND semi
    (tokenized-title) blocks one-per-device in sharded batches; None when
    fewer than 2 devices are visible.  Blocks that fail staging, change
    class, or fail the on-device uniformity check fall back to the
    single-chip codec, preserving order (reference: every block class
    flows through the same worker pool, DsrcWorker.cpp:30-73)."""
    from .parallel.mesh import (MeshSemiCodec, MeshUniformCodec,
                                local_device_mesh)
    mesh = local_device_mesh()
    if mesh is None:
        return None
    n_dev = int(np.prod(mesh.devices.shape))

    def gen():
        ucodec = None
        scodec = None
        pending = []           # [(kind, payload, block)]
        kind = None            # current batch class: 'u' | 's'

        def flush():
            nonlocal pending
            batch, pending = pending, []
            if not batch:
                return
            mcodec = ucodec if batch[0][0] == "u" else scodec
            if mcodec is None or len(batch) < mcodec.n_devices:
                for _, _, blk in batch:
                    yield job(blk)
                return
            if batch[0][0] == "u":
                mats = np.stack([m for _, (m, _), _ in batch])
                recs = [n for _, (_, n), _ in batch]
                results, _ = mcodec.compress_blocks(mats, recs)
                for (_, (m, n), blk), res in zip(batch, results):
                    if res is None:
                        yield job(blk)  # failed uniformity -> generic codec
                    else:
                        blob, info = res
                        yield blob, n, info
            else:
                staged = [p for _, p, _ in batch]
                results, _ = mcodec.compress_blocks(staged)
                for (_, p, _), (blob, info) in zip(batch, results):
                    yield blob, p["num_rec"], info

        for block in blocks_iter:
            staged = _host_stage_uniform(block, codec.shape.cap)
            if staged is not None:
                mat, num_rec, spec, rpad = staged
                if kind != "u" or (
                        ucodec is not None and
                        (spec != ucodec.spec or rpad != ucodec.rpad)):
                    yield from flush()
                    kind = "u"
                    if ucodec is not None and (spec != ucodec.spec
                                               or rpad != ucodec.rpad):
                        ucodec = None
                if ucodec is None:
                    ucodec = MeshUniformCodec(mesh, spec, rpad)
                pending.append(("u", (mat, num_rec), block))
                if len(pending) == n_dev:
                    yield from flush()
                continue
            semi = codec.stage_semi_tok_for_mesh(block)
            if semi is not None:
                sdict, read_len, rpad, pcs = semi
                from .parallel.uniform_pipeline import WIRE_DEFAULT
                if kind != "s" or (
                        scodec is not None and
                        not scodec.matches(read_len, rpad, pcs,
                                           WIRE_DEFAULT)):
                    yield from flush()
                    kind = "s"
                    if scodec is not None and not scodec.matches(
                            read_len, rpad, pcs, WIRE_DEFAULT):
                        scodec = None
                if scodec is None:
                    scodec = MeshSemiCodec(mesh, read_len, rpad, pcs)
                pending.append(("s", sdict, block))
                if len(pending) == n_dev:
                    yield from flush()
                continue
            yield from flush()
            kind = None
            yield job(block)
        yield from flush()

    return gen()


def _mesh_decompress_results(blobs_iter, codec: BlockCodec):
    """Generator of decoded FASTQ text arrays, batching consecutive
    uniform / tokenized-semi blobs one-per-device; None when fewer than 2
    devices are visible."""
    from .models.block import (BLOCK_SEMI, BLOCK_UNIFORM, parse_semi_block,
                               read_uniform_block)
    from .parallel.mesh import (MeshSemiCodec, MeshUniformCodec,
                                local_device_mesh)
    from .utils.bitio import BitReader
    mesh = local_device_mesh()
    if mesh is None:
        return None
    n_dev = int(np.prod(mesh.devices.shape))

    def gen():
        ucodec = None
        scodec = None
        pending = []           # [(kind, payload, blob)]
        kind = None

        def flush():
            nonlocal pending
            batch, pending = pending, []
            if not batch:
                return
            mcodec = ucodec if batch[0][0] == "u" else scodec
            if mcodec is None or len(batch) < mcodec.n_devices:
                for _, _, blob in batch:
                    yield codec.decompress(blob)
                return
            if batch[0][0] == "u":
                yield from mcodec.decompress_blocks(
                    [c for _, (c, _), _ in batch],
                    [n for _, (_, n), _ in batch])
            else:
                yield from mcodec.decompress_blocks(
                    [p for _, p, _ in batch])

        for blob in blobs_iter:
            if blob[:1] == bytes([BLOCK_UNIFORM]):
                r = BitReader(blob)
                r.get_byte()
                try:
                    comp_np, spec, num_rec, rpad, wire = \
                        read_uniform_block(r)
                except Exception:
                    yield from flush()
                    kind = None
                    yield codec.decompress(blob)
                    continue
                if kind != "u" or (
                        ucodec is not None and
                        not ucodec.matches(comp_np, spec, rpad, wire)):
                    yield from flush()
                    kind = "u"
                    if ucodec is not None and not ucodec.matches(
                            comp_np, spec, rpad, wire):
                        ucodec = None
                if ucodec is None:
                    ucodec = MeshUniformCodec(mesh, spec, rpad, wire)
                pending.append(("u", (comp_np, num_rec), blob))
                if len(pending) == n_dev:
                    yield from flush()
                continue
            if blob[:1] == bytes([BLOCK_SEMI]):
                r = BitReader(blob)
                r.get_byte()
                try:
                    p = parse_semi_block(r, codec.shape.cap)
                except Exception:
                    yield from flush()
                    kind = None
                    yield codec.decompress(blob)
                    continue
                if p["mode"] == 2:
                    if kind != "s" or (
                            scodec is not None and
                            not scodec.matches(p["read_len"], p["rpad"],
                                               p["pcs"], p["wire"])):
                        yield from flush()
                        kind = "s"
                        if scodec is not None and not scodec.matches(
                                p["read_len"], p["rpad"], p["pcs"],
                                p["wire"]):
                            scodec = None
                    if scodec is None:
                        scodec = MeshSemiCodec(mesh, p["read_len"],
                                               p["rpad"], p["pcs"],
                                               p["wire"])
                    pending.append(("s", p, blob))
                    if len(pending) == n_dev:
                        yield from flush()
                    continue
            yield from flush()
            kind = None
            yield codec.decompress(blob)
        yield from flush()

    return gen()


def compress(fastq_path, dsrc_path, **kwargs) -> StreamsInfo:
    """One-shot convenience: dsrc_tpu.compress("in.fastq", "out.xfqz")."""
    return DsrcModule(InputParameters(**kwargs)).compress(fastq_path,
                                                          dsrc_path)


def decompress(dsrc_path, fastq_path) -> None:
    """One-shot convenience: dsrc_tpu.decompress("in.xfqz", "out.fastq")."""
    DsrcModule().decompress(dsrc_path, fastq_path)
