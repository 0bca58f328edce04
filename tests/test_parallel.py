"""Multi-chip sharding dry-run on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from dsrc_tpu.parallel import mesh as M


def test_dryrun_8_devices():
    assert len(jax.devices()) >= 8
    M.dryrun(8)


def test_dryrun_2_devices():
    M.dryrun(2, cap=4096, rcap=64)
