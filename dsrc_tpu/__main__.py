"""python -m dsrc_tpu — CLI entry point (reference: src/main.cpp)."""
import sys

from .cli import main

sys.exit(main())
