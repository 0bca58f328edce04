"""Host-side FASTQ chunking into record-aligned blocks.

Counterpart of the reference's IFastqStreamReader::ReadNextChunk
(FastqStream.cpp:18-98), which scans backward near the chunk end for a record
start using '@'/'+' heuristics.  We use a simpler *exact* rule instead:
FASTQ records are 4 lines, and the chunker reads sequentially, so the running
newline count identifies record boundaries unambiguously — a chunk ends after
the last newline whose cumulative line index is a multiple of 4.  The cut
tail is carried into the next chunk.

Newline scanning is vectorized (numpy) with an optional C++ fast path
(native/ runtime).
"""
from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from ..config import DsrcException
from ..utils.native import scan_records as _count_and_last_boundary


class FastqChunker:
    """Split a byte stream of FASTQ text into record-aligned blocks.

    Feed with `read(n)`-style source; yields numpy uint8 arrays, each
    containing whole records and ending with a newline.
    """

    def __init__(self, source, block_size: int):
        self._source = source
        self._block_size = max(block_size, 1 << 12)
        self._tail = b""
        self._lines_seen = 0
        self._eof = False

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            chunk = self.next_block()
            if chunk is None:
                return
            yield chunk

    def next_block(self) -> Optional[np.ndarray]:
        if self._eof and not self._tail:
            return None
        parts = [self._tail]
        size = len(self._tail)
        self._tail = b""
        while size < self._block_size and not self._eof:
            data = self._source.read(self._block_size - size)
            if not data:
                self._eof = True
                break
            parts.append(data)
            size += len(data)
        buf = b"".join(parts)
        if not buf:
            return None
        if self._eof:
            if not buf.endswith(b"\n"):
                buf += b"\n"  # terminate final record
            arr = np.frombuffer(buf, dtype=np.uint8)
            nl, _ = _count_and_last_boundary(arr, self._lines_seen)
            if (self._lines_seen + nl) % 4 != 0:
                raise DsrcException(
                    "malformed FASTQ: total line count not a multiple of 4")
            self._lines_seen += nl
            return arr
        arr = np.frombuffer(buf, dtype=np.uint8)
        nl, cut = _count_and_last_boundary(arr, self._lines_seen)
        if cut < 0:
            # no full record in a whole block: grow by retrying with a
            # larger effective block (pathological ultra-long records)
            self._tail = buf
            self._block_size *= 2
            return self.next_block()
        self._tail = buf[cut:]
        cut_lines = np.count_nonzero(arr[:cut] == 10)
        self._lines_seen += int(cut_lines)
        return arr[:cut].copy()
