"""dsrc_tpu — a TPU-native FASTQ compression engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference DSRC 2.02 (refresh-bio/DSRC): lossless and lossy FASTQ compression
with DNA modes 0-3, quality modes 0-2, tokenized read-ID compression,
Illumina/SOLiD/454 support, CRC32 self-verification, a block-indexed archive
container, CLI and library APIs.  See SURVEY.md for the reference analysis
and DESIGN.md for the TPU-first architecture.
"""
__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: first-run compiles of the big block
# executables are written here and reused by every later process (CLI,
# library, bench).  ~/.cache survives /tmp cleanup; override or disable
# with the standard JAX env vars.
_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "dsrc_tpu", "jax"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from .config import (  # noqa: F401
    AUTO_QUALITY_OFFSET,
    CompressionSettings,
    DatasetType,
    DsrcException,
    FieldMask,
    InputParameters,
)


def __getattr__(name):
    # Lazy exports that pull in jax (keep `import dsrc_tpu` light).
    if name in ("DsrcModule", "compress", "decompress"):
        from . import api
        return getattr(api, name)
    if name in ("DsrcArchive", "FastqFile", "FastqRecord"):
        from . import archive_api
        return getattr(archive_api, name)
    raise AttributeError(f"module 'dsrc_tpu' has no attribute {name!r}")
