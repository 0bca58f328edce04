"""Benchmark: on-chip FASTQ compress+decompress throughput vs the reference.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MB/s", "vs_baseline": N}

Metric (BASELINE.json): FASTQ compress+decompress MB/s per chip.  The
measured path is the device-resident pipeline (parallel/device_pipeline.py):
blocks staged in HBM, one jit dispatch per block per direction, payloads
never leave the chip, round-trip verified on device.  Baseline: DSRC 2 fast
mode ~500 MB/s compression on 8 CPU threads (docs p.1 §1.3, BASELINE.md) —
vs_baseline = roundtrip_MBps / 500.

Env knobs: BENCH_MB (default 64), BENCH_D (DNA level 0..3, default 0),
BENCH_Q (quality level 0..2, default 0), BENCH_BLOCK_MB (default 4).
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dsrc_tpu.parallel import uniform_pipeline as UP
    from dsrc_tpu.utils.synth import make_fastq_fast

    mb = int(os.environ.get("BENCH_MB", "64"))
    d = int(os.environ.get("BENCH_D", "0"))
    q = int(os.environ.get("BENCH_Q", "0"))
    block_mb = int(os.environ.get("BENCH_BLOCK_MB", "8"))
    group = int(os.environ.get("BENCH_GROUP", "8"))
    read_len = 100

    t0 = time.time()
    probe = make_fastq_fast(1, read_len, fixed_width=True)
    spec = UP.detect_spec(probe)
    rec_bytes = spec.rec_bytes
    rpad = ((block_mb << 20) // rec_bytes // UP.GROUP) * UP.GROUP
    cap = rpad * rec_bytes
    num_blocks = max(group, ((mb << 20) // cap) // group * group)
    data = np.frombuffer(
        make_fastq_fast(rpad * num_blocks, read_len, seed=1,
                        fixed_width=True), np.uint8)
    gen_s = time.time() - t0
    size_mb = len(data) / (1 << 20)

    t0 = time.time()
    blocks = jax.device_put(
        data.reshape(num_blocks // group, group, rpad, rec_bytes))
    jax.block_until_ready(blocks)
    stage_s = time.time() - t0
    nr = jnp.int32(rpad)

    vcomp = jax.jit(jax.vmap(
        lambda b: UP.compress_uniform(b, nr, spec, rpad)))
    vdec = jax.jit(jax.vmap(lambda c: UP.decompress_uniform(c, spec, rpad)))
    vok = jax.jit(jax.vmap(lambda o, b: UP.mats_equal(o, b, nr)))

    # warmup / compile (one group)
    t0 = time.time()
    comp0 = vcomp(blocks[0])
    out0 = vdec(comp0)
    ok0 = bool(np.asarray(vok(out0, blocks[0])).all())
    warm_s = time.time() - t0
    if not ok0:
        print(json.dumps(dict(metric="fastq_roundtrip_MBps_per_chip",
                              value=0.0, unit="MB/s", vs_baseline=0.0)))
        sys.exit(1)

    prof_dir = os.environ.get("BENCH_PROFILE")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)

    # timed compress (queue all groups; sync once on the size vectors)
    t0 = time.time()
    comps = [vcomp(blocks[g]) for g in range(num_blocks // group)]
    sizes = np.concatenate([np.asarray(c["comp_bytes"]) for c in comps])
    comp_s = time.time() - t0

    # timed decompress + on-device verify
    t0 = time.time()
    oks = []
    for g in range(num_blocks // group):
        out = vdec(comps[g])
        oks.append(vok(out, blocks[g]))
    ok = bool(np.asarray(jnp.concatenate(oks)).all())
    dec_s = time.time() - t0
    if prof_dir:
        jax.profiler.stop_trace()
    sizes = jnp.asarray(sizes)

    comp_mbps = size_mb / comp_s
    dec_mbps = size_mb / dec_s
    rt_mbps = 2 * size_mb / (comp_s + dec_s)
    ratio = float(len(data) / np.asarray(sizes).sum())
    print(json.dumps(dict(
        platform=jax.devices()[0].platform,
        input_mb=round(size_mb, 1), blocks=num_blocks,
        gen_s=round(gen_s, 1), stage_s=round(stage_s, 2),
        warmup_s=round(warm_s, 1),
        compress_s=round(comp_s, 3), compress_MBps=round(comp_mbps, 1),
        decompress_s=round(dec_s, 3), decompress_MBps=round(dec_mbps, 1),
        compression_ratio=round(ratio, 3), roundtrip_ok=ok,
        levels=f"-d{d} -q{q}", block_mb=block_mb,
    )), file=sys.stderr)
    if not ok:
        print(json.dumps(dict(metric="fastq_roundtrip_MBps_per_chip",
                              value=0.0, unit="MB/s", vs_baseline=0.0)))
        sys.exit(1)
    print(json.dumps(dict(
        metric="fastq_roundtrip_MBps_per_chip",
        value=round(rt_mbps, 2), unit="MB/s",
        vs_baseline=round(rt_mbps / 500.0, 4))))


if __name__ == "__main__":
    main()
