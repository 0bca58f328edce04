from .bitio import BitReader, BitWriter  # noqa: F401
from .crc32 import crc32  # noqa: F401
