"""Record-at-a-time API demo — counterpart of the reference
examples/py/example2.py (DsrcArchive + FastqFile): write records one by one
into an archive, then read them back as records.

Usage: python examples/example2.py out.xfqz
"""
import sys

from dsrc_tpu import DsrcArchive, FastqFile, FastqRecord
from dsrc_tpu.config import FieldMask, InputParameters


def main(argv):
    if len(argv) != 1:
        print(__doc__)
        return 1
    archive_path = argv[0]

    # ---- write: records produced programmatically (could also come from
    # FastqFile("reads.fastq") — see the FastqFile class)
    params = InputParameters(dna_compression_level=1,
                             quality_compression_level=1)
    writer = DsrcArchive(params)
    writer.start_compress(archive_path)
    for i in range(1000):
        writer.write_next_record(FastqRecord(
            tag=f"READ.{i + 1} lane:{i % 8}",
            sequence="ACGTACGTAAGGCCTT" * 4,
            quality="IIIIHHHHGGGGFFFF" * 4))
    writer.finish_compress()

    # ---- read back, record by record
    reader = DsrcArchive()
    reader.start_decompress(archive_path)
    count = 0
    first = None
    while True:
        rec = reader.read_next_record()
        if rec is None:
            break
        if first is None:
            first = rec
        count += 1
    reader.finish_decompress()
    print(f"read {count} records; first: @{first.tag} "
          f"({len(first.sequence)} bp)")

    # ---- lossy ID filtering: FieldMask selects 1-based title fields
    mask = FieldMask.only(1)      # keep only "READ.<n>"... field 1
    params2 = InputParameters(tag_preserve_mask=mask.mask)
    print("field-filter mask:", hex(params2.tag_preserve_mask))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
