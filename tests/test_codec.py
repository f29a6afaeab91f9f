"""End-to-end spec codec round-trip tests, covering the reference's FSE and
API suites (reference: src/fse.rs:461-506, src/lib.rs:280-302), generalized
to k-way interleave."""

import numpy as np
import pytest

from entropy_coders_tpu.spec.codec import fse_compress, fse_decompress
from entropy_coders_tpu.spec.fse import EncodeTable
from entropy_coders_tpu.spec.histogram import NormHistogram

from conftest import gen_sequence


@pytest.mark.parametrize("k", [1, 2, 4])
@pytest.mark.parametrize("size", [1 << 10, (1 << 10) + 1, (1 << 10) + 3, 37])
def test_roundtrip(k, size):
    src = gen_sequence(0.2, size)
    dst = bytearray()
    fse_compress(src, dst, k=k)
    dec = bytearray()
    n = fse_decompress(dst, dec, k=k)
    assert n == size
    np.testing.assert_array_equal(np.frombuffer(bytes(dec), np.uint8), src)


@pytest.mark.parametrize("k", [1, 2])
def test_roundtrip_64k(k):
    src = gen_sequence(0.2, 1 << 16)
    dst = bytearray()
    fse_compress(src, dst, k=k)
    dec = bytearray()
    assert fse_decompress(dst, dec, k=k) == 1 << 16
    np.testing.assert_array_equal(np.frombuffer(bytes(dec), np.uint8), src)


@pytest.mark.parametrize("prob", [0.05, 0.5, 0.9])
def test_roundtrip_entropies(prob):
    src = gen_sequence(prob, 1 << 12)
    dst = bytearray()
    fse_compress(src, dst, k=2)
    dec = bytearray()
    assert fse_decompress(dst, dec, k=2) == len(src)
    np.testing.assert_array_equal(np.frombuffer(bytes(dec), np.uint8), src)


def test_compression_ratio_within_bound():
    src = gen_sequence(0.2, 1 << 15)
    dst = bytearray()
    fse_compress(src, dst, k=2)
    assert len(dst) <= EncodeTable.compress_bound(len(src))
    # prob=0.2 geometric-ish data should compress well below 1:1
    assert len(dst) < len(src)


def test_decompress_rejects_corrupt_frames():
    src = gen_sequence(0.2, 1 << 10)
    dst = bytearray()
    fse_compress(src, dst, k=1)
    # choppping the payload to an all-zero tail breaks the marker framing
    corrupt = bytes(dst[:8]) + b"\x00" * 4
    assert fse_decompress(corrupt, bytearray(), k=1) is None


def test_incompressible_data_roundtrips(rng):
    src = rng.integers(0, 256, size=1 << 12, dtype=np.uint8)
    dst = bytearray()
    fse_compress(src, dst, k=2)
    dec = bytearray()
    assert fse_decompress(dst, dec, k=2) == len(src)
    np.testing.assert_array_equal(np.frombuffer(bytes(dec), np.uint8), src)


def test_skewed_data_roundtrips(rng):
    # heavily skewed: exercises the -1 low-probability sentinel
    src = np.where(
        rng.random(1 << 14) < 0.99,
        np.uint8(7),
        rng.integers(0, 256, size=1 << 14, dtype=np.uint8),
    ).astype(np.uint8)
    dst = bytearray()
    fse_compress(src, dst, k=2)
    dec = bytearray()
    assert fse_decompress(dst, dec, k=2) == len(src)
    np.testing.assert_array_equal(np.frombuffer(bytes(dec), np.uint8), src)


def test_explicit_histogram_reuse():
    src = gen_sequence(0.2, 1 << 12)
    hist = NormHistogram.new(src)
    dst = bytearray()
    fse_compress(src, dst, k=2, hist=hist)
    dec = bytearray()
    assert fse_decompress(dst, dec, k=2) == len(src)


def test_single_symbol_input_rejected():
    """Single-symbol inputs normalize to a full-table degenerate
    histogram whose decode-until-failure loop never terminates in the
    reference (every step is a 0-bit read; lib.rs:199-207 +
    stack_reader.rs:176-183). Documented divergence: we refuse to emit
    the undecodable frame instead of replicating the hang. Found by
    tests/fuzz_diff.py (a single-run 'runs' input)."""
    for sym in (9, 0):  # sym 0 is the case where the reference panics
        with pytest.raises(ValueError):
            fse_compress(np.full(18, sym, np.uint8), bytearray(), k=1)


def test_degenerate_table_frame_decode_returns_none():
    # hand-captured frame: L=5 header whose table is fully owned by
    # symbol 9 (hex 10de1f) + payload 0x20 — decode must not spin
    frame = bytes.fromhex("10de1f20")
    assert fse_decompress(frame, bytearray(), k=1) is None
