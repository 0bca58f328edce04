"""Whole-file API demo — counterpart of the reference examples/py/example1.py
(and examples/cpplib/example1.cpp): compress a FASTQ file to an archive and
decompress it back, with a few configuration knobs.

Usage: python examples/example1.py in.fastq out.xfqz roundtrip.fastq
"""
import sys

from dsrc_tpu import DsrcModule, InputParameters


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 1
    fastq_in, archive, fastq_out = argv

    module = DsrcModule(InputParameters(
        dna_compression_level=2,        # -d2
        quality_compression_level=2,    # -q2
        fastq_block_size_mb=8,          # -b8
        calculate_crc32=True,           # -c (per-block self-verification)
    ))
    info = module.compress(fastq_in, archive)
    for stream in ("tag", "dna", "quality"):
        print(f"{stream:8s} raw {info.raw[stream]:>12d} "
              f"compressed {info.comp[stream]:>12d}")

    module.decompress(archive, fastq_out)
    print("done; compare with e.g.  cmp", fastq_in, fastq_out)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
