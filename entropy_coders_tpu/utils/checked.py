"""Checkify sanitizer mode for the XLA coding cores.

The reference leans on ``debug_assert!`` contracts around its unsafe
bit-I/O (reference: src/bitstream/writer.rs:142-145,165-175,
src/bitstream/stack_reader.rs:177,205); the JAX analog is
``jax.experimental.checkify``: run the same traced computation with
index/NaN/div checks instrumented, so an out-of-bounds table gather or
bad shift surfaces as a checkify error instead of XLA's silent clamping
semantics.

This is a *sanitizer* — slower than the production path and meant for
tests/debugging (tests/test_checked.py runs the round trip under it),
exactly like the reference's debug-build asserts. Pallas kernels cannot
be checkified; their equivalent is interpret-mode testing plus the
in-kernel cursor-drain error output (ops.pl_coder), both exercised by
the test suite.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.experimental import checkify

from ..ops.coder import _decode_core, _encode_core

__all__ = [
    "checked_encode_core", "checked_decode_core",
    "checked_encode_interleaved", "checked_decode_interleaved", "CHECKS",
]

CHECKS = checkify.index_checks | checkify.float_checks | checkify.div_checks


@partial(jax.jit, static_argnames=("k", "L", "W"))
def _enc(syms, valid, init_syms, finish_slots, tt_bits, tt_fs, table,
         *, k, L, W):
    f = lambda *a: _encode_core(*a, k=k, L=L, W=W)
    err, out = checkify.checkify(f, errors=CHECKS)(
        syms, valid, init_syms, finish_slots, tt_bits, tt_fs, table)
    return err, out


@partial(jax.jit, static_argnames=("k", "L", "R"))
def _dec(words, total_bits, packed, *, k, L, R):
    f = lambda *a: _decode_core(*a, k=k, L=L, R=R)
    err, out = checkify.checkify(f, errors=CHECKS)(
        words, total_bits, packed)
    return err, out


def checked_encode_core(syms, valid, init_syms, finish_slots, tt_bits,
                        tt_fs, table, *, k, L, W):
    """``ops.coder._encode_core`` under checkify; raises on any
    instrumented check failure (index OOB, NaN, div-by-zero)."""
    err, out = _enc(syms, valid, init_syms, finish_slots, tt_bits, tt_fs,
                    table, k=k, L=L, W=W)
    checkify.check_error(err)
    return out


def checked_decode_core(words, total_bits, packed, *, k, L, R):
    """``ops.coder._decode_core`` under checkify; raises on any
    instrumented check failure."""
    err, out = _dec(np.asarray(words), np.asarray(total_bits),
                    np.asarray(packed), k=k, L=L, R=R)
    checkify.check_error(err)
    return out


def checked_encode_interleaved(data, k, enc_table, table_log):
    """``ops.coder.encode_interleaved`` with the sanitized core."""
    from ..ops import coder

    return coder.encode_interleaved(data, k, enc_table, table_log,
                                    core=checked_encode_core)


def checked_decode_interleaved(payload, k, dec_table, table_log, max_out):
    """``ops.coder.decode_interleaved`` with the sanitized core."""
    from ..ops import coder

    return coder.decode_interleaved(payload, k, dec_table, table_log,
                                    max_out, core=checked_decode_core)
