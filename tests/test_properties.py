"""Hypothesis property tests for the spec layer.

The reference's strongest suite is its bitstream property tests
(reference src/bitstream/mod.rs:17-225: random (value, width) lists at
every byte offset). The repo already clones those deterministically
(test_bitstream.py) and soaks the full stack with seeded fuzzers
(fuzz_diff.py); this module adds *shrinking* property tests on top —
when an invariant breaks, hypothesis reduces the counterexample to a
minimal one instead of a 4 KiB blob. Profiles are derandomized so CI
is reproducible.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import assume, given, settings, strategies as st

from entropy_coders_tpu.spec.bitstream import (BitStackReader,
                                               BitStackWriter,
                                               BitStreamReader)
from entropy_coders_tpu.spec.codec import fse_compress, fse_decompress
from entropy_coders_tpu.spec.histogram import Histogram, NormHistogram

SETTINGS = settings(max_examples=60, deadline=None, derandomize=True)

items = st.lists(
    st.integers(min_value=1, max_value=16).flatmap(
        lambda w: st.tuples(st.integers(0, (1 << w) - 1), st.just(w))),
    min_size=1, max_size=200)


@SETTINGS
@given(items=items, offset=st.integers(0, 7))
def test_bitstack_write_read_roundtrip(items, offset):
    """Reference property (src/bitstream/mod.rs:112-155): write a
    (value, width) list LSB-first at any byte offset, read it back
    LIFO; bit accounting and drain must be exact."""
    out = bytearray(b"\xAA" * offset)  # nonzero prefix: offsets 0-7
    w = BitStackWriter(out)
    for v, width in items:
        w.write_bits(v, width)
    w.write_bits(1, 1)  # terminal marker
    bits = w.finish()
    assert bits == sum(width for _, width in items) + 1
    assert len(out) == offset + (bits + 7) // 8

    r = BitStackReader.new(bytes(out[offset:]))
    assert r is not None
    for v, width in reversed(items):
        assert r.read(width) == v
    # the marker bit is consumed by construction; below it only the
    # prefix remains
    assert r.available() == 0
    assert r.finish()


@SETTINGS
@given(items=items)
def test_bitstream_forward_read_matches_writes(items):
    """Sequential LSB-first appends equal a forward LSB-first stream
    (the property NormHistogram.write/read relies on — reference
    src/histogram.rs:377,437)."""
    out = bytearray()
    w = BitStackWriter(out)
    for v, width in items:
        w.write_bits(v, width)
    bits = w.finish()
    r = BitStreamReader(bytes(out), bits)
    for v, width in items:
        assert r.read(width) == v
    assert r.finish()


data_st = st.binary(min_size=2, max_size=4096)


@SETTINGS
@given(data=data_st, log2=st.integers(5, 15))
def test_normalize_invariants_and_header_roundtrip(data, log2):
    """hist_verify's oracle properties (reference
    src/histogram.rs:553-587) over arbitrary inputs: exact 2^log2 mass,
    zero/nonzero preservation, header write->read identity with
    trailing bytes preserved."""
    arr = np.frombuffer(data, np.uint8)
    assume(len(np.unique(arr)) >= 2)
    hist = Histogram(arr)
    norm = hist.normalize(log2)
    t = norm.table
    assert sum(int(v) if v > 0 else 1 for v in t[: norm.table_len]
               if v != 0) == 1 << norm.log2
    raw = np.bincount(arr, minlength=256)
    for s in range(256):
        assert (raw[s] == 0) == (t[s] == 0), s
    out = bytearray()
    norm.write(out)
    out += b"I am a test"
    back, rest = NormHistogram.read(bytes(out))
    assert rest == b"I am a test"
    assert back.log2 == norm.log2
    assert back.table_len == norm.table_len
    assert np.array_equal(back.table, norm.table)


@SETTINGS
@given(data=st.binary(min_size=5, max_size=4096), k=st.integers(1, 2))
def test_codec_roundtrip(data, k):
    """End-to-end frame property (reference src/lib.rs:280-302): any
    multi-symbol input of >= 5 bytes round-trips bit-exactly through
    the k-stream reference-format frame (< 5 bytes cannot normalize —
    ``optimal_log2`` raises where the reference underflows, PARITY.md
    divergences)."""
    arr = np.frombuffer(data, np.uint8)
    assume(len(np.unique(arr)) >= 2)
    frame = bytearray()
    fse_compress(arr, frame, k=k)
    dec = bytearray()
    n = fse_decompress(bytes(frame), dec, k=k)
    assert n == len(data)
    assert bytes(dec) == data
