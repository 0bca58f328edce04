"""Pallas positional-rANS kernels vs the pure-XLA wavefronts.

The kernels (ops/rans_pallas.py) must produce BIT-IDENTICAL payloads to
parallel/uniform_pipeline.encode_positional and decode each other's output
in both alignment modes.  Runs on CPU via the Pallas interpreter.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsrc_tpu.parallel import uniform_pipeline as UP
from dsrc_tpu.ops import rans_pallas as RP


def _xla_encode(mat, num_rec, nsym, group):
    os.environ["DSRC_TPU_PALLAS"] = "0"
    try:
        return jax.jit(UP.encode_positional, static_argnums=(2, 3))(
            mat, num_rec, nsym, group)
    finally:
        os.environ["DSRC_TPU_PALLAS"] = "auto"


def _xla_decode(payload, states, nwords, table, num_rec, p, rpad, nsym,
                group, **kw):
    os.environ["DSRC_TPU_PALLAS"] = "0"
    try:
        return UP.decode_positional(payload, states, nwords, table,
                                    num_rec, p, rpad, nsym, group, **kw)
    finally:
        os.environ["DSRC_TPU_PALLAS"] = "auto"


@pytest.mark.parametrize("num_rec", [512, 300])
def test_pallas_encode_matches_xla(num_rec):
    rpad, p, nsym, group = 512, 5, 8, 16
    rng = np.random.default_rng(3)
    mat = jnp.asarray(rng.integers(0, nsym, (rpad, p)), jnp.int32)
    xp, xn, xs, xtab = _xla_encode(mat, jnp.int32(num_rec), nsym, group)
    pp, pn, ps = RP.encode_positional_tpu(
        mat, jnp.int32(num_rec), xtab, p, nsym, group,
        wp_out=xp.shape[1], interpret=True)
    assert pp.shape == xp.shape
    np.testing.assert_array_equal(np.asarray(pn), np.asarray(xn))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(xs))
    np.testing.assert_array_equal(np.asarray(pp), np.asarray(xp))


@pytest.mark.parametrize("left", [False, True])
def test_pallas_decode_roundtrip(left):
    """Pallas decode of an XLA-encoded stream, both alignments."""
    rpad, p, nsym, group = 512, 6, 32, 16
    num_rec = 400
    rng = np.random.default_rng(7)
    mat = jnp.asarray(
        np.minimum(rng.geometric(0.3, (rpad, p)) - 1, nsym - 1), jnp.int32)
    payload, nwords, states, table = _xla_encode(
        mat, jnp.int32(num_rec), nsym, group)
    payload = np.asarray(payload)
    nwords = np.asarray(nwords)
    if left:
        # simulate the deserialized LEFT-aligned layout (models/block.py)
        u16 = np.ascontiguousarray(payload.astype("<i4")).view("<u2") \
            .reshape(payload.shape[0], -1)
        w = u16.shape[1]
        cols = np.arange(w)[None, :]
        flat = u16[cols >= (w - nwords[:, None])]
        out = np.zeros_like(u16)
        out[cols < nwords[:, None]] = flat
        payload = out.view("<u4").view(np.int32)
    got = RP.decode_positional_tpu(
        jnp.asarray(payload), jnp.asarray(states), jnp.asarray(nwords),
        table, jnp.int32(num_rec), p, rpad, nsym, group, left=left,
        interpret=True)
    ref = np.where(np.arange(rpad)[:, None] < num_rec, np.asarray(mat), 0)
    got = np.where(np.arange(rpad)[:, None] < num_rec, np.asarray(got), 0)
    np.testing.assert_array_equal(got, ref)


def test_pallas_delta_decode():
    """Vertical-delta titles decode through the kernel's prev-row scratch."""
    rpad, p, nsym, group = 256, 7, UP.TITLE_A, 16
    num_rec = 200
    rng = np.random.default_rng(11)
    base = rng.integers(0, nsym, (1, p))
    mat = np.repeat(base, rpad, 0)
    jitter = rng.integers(0, nsym, (rpad, p))
    mat = np.where(rng.random((rpad, p)) < 0.1, jitter, mat)
    matj = jnp.asarray(mat, jnp.int32)
    tsyms = UP.title_delta(matj, group)
    payload, nwords, states, table = _xla_encode(
        tsyms, jnp.int32(num_rec), nsym, group)
    got = RP.decode_positional_tpu(
        payload, states, nwords, table, jnp.int32(num_rec), p, rpad, nsym,
        group, delta=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:num_rec], mat[:num_rec])


def test_xla_decodes_pallas_payload():
    """Cross direction: XLA wavefront decodes a kernel-encoded stream."""
    rpad, p, nsym, group = 256, 4, 16, 16
    num_rec = 256
    rng = np.random.default_rng(13)
    mat = jnp.asarray(rng.integers(0, nsym, (rpad, p)), jnp.int32)
    _, _, _, table = _xla_encode(mat, jnp.int32(num_rec), nsym, group)
    pp, pn, ps = RP.encode_positional_tpu(
        mat, jnp.int32(num_rec), table, p, nsym, group,
        wp_out=((-(-group * p // RP.UE) * RP.UE) + RP.UE) // 2,
        interpret=True)
    got = _xla_decode(pp, ps, pn, table, jnp.int32(num_rec), p, rpad, nsym,
                      group)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(mat))
