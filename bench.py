"""Benchmark: FASTQ compression throughput vs the reference's headline number.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline: DSRC 2 fast mode (-m0 = -d0 -q0) at ~500 MB/s on 8 CPU threads
(docs/dsrc-user-guide.pdf p.1 §1.3; BASELINE.md).  We measure single-device
wall-clock compress throughput (chunk -> parse -> transform -> encode ->
serialized archive bytes) after a one-block warmup, on synthetic Illumina
FASTQ (100 bp reads).

Env knobs: BENCH_MB (input size, default 64), BENCH_D/BENCH_Q (levels,
default 0/0 = fast mode), BENCH_BLOCK_MB (default 8).
"""
from __future__ import annotations

import io
import json
import os
import sys
import time

BASELINE_MBPS = 500.0


def main() -> None:
    import jax

    from dsrc_tpu.api import DsrcModule
    from dsrc_tpu.config import InputParameters
    from dsrc_tpu.utils.synth import make_fastq_fast

    mb = int(os.environ.get("BENCH_MB", "64"))
    d = int(os.environ.get("BENCH_D", "0"))
    q = int(os.environ.get("BENCH_Q", "0"))
    block_mb = int(os.environ.get("BENCH_BLOCK_MB", "8"))

    read_len = 100
    rec_bytes = 142 + 2 * read_len          # title+seq+plus+qual, approx
    num_records = (mb << 20) // rec_bytes
    t0 = time.time()
    data = make_fastq_fast(num_records, read_len, seed=1)
    gen_s = time.time() - t0
    size_mb = len(data) / (1 << 20)

    params = InputParameters(dna_compression_level=d,
                             quality_compression_level=q,
                             fastq_block_size_mb=block_mb)
    m = DsrcModule(params)

    # warmup: compile all kernels on a prefix (2 blocks)
    warm = data[: min(len(data), 2 * (block_mb << 20))]
    nl = warm.rfind(b"\n", 0, len(warm))
    # align warmup to whole records: trim to a multiple of 4 lines
    lines = warm[:nl + 1].count(b"\n")
    if lines % 4:
        idx = len(warm)
        for _ in range(lines % 4):
            idx = warm.rfind(b"\n", 0, idx - 1) + 1
        warm = warm[:idx]
    t0 = time.time()
    m.compress(io.BytesIO(warm), io.BytesIO())
    warm_s = time.time() - t0

    arch = io.BytesIO()
    t0 = time.time()
    m.compress(io.BytesIO(data), arch)
    comp_s = time.time() - t0

    out = io.BytesIO()
    arch.seek(0)
    t0 = time.time()
    m.decompress(arch, out)
    dec_s = time.time() - t0
    ok = out.getvalue() == data

    comp_mbps = size_mb / comp_s
    dec_mbps = size_mb / dec_s
    ratio = len(data) / arch.getbuffer().nbytes
    print(json.dumps(dict(
        platform=jax.devices()[0].platform,
        input_mb=round(size_mb, 1), gen_s=round(gen_s, 1),
        warmup_s=round(warm_s, 1), compress_s=round(comp_s, 2),
        decompress_s=round(dec_s, 2),
        decompress_MBps=round(dec_mbps, 2),
        compression_ratio=round(ratio, 3), roundtrip_ok=ok,
        levels=f"-d{d} -q{q} -b{block_mb}",
    )), file=sys.stderr)
    if not ok:
        print(json.dumps(dict(metric="compress_throughput_d0q0",
                              value=0.0, unit="MB/s", vs_baseline=0.0)))
        sys.exit(1)
    print(json.dumps(dict(
        metric=f"compress_throughput_d{d}q{q}",
        value=round(comp_mbps, 2), unit="MB/s",
        vs_baseline=round(comp_mbps / BASELINE_MBPS, 4))))


if __name__ == "__main__":
    main()
