"""Bit-exactness of the JAX k-way coder against the executable spec (and
hence the reference wire format for k=1,2)."""

import numpy as np
import pytest

from entropy_coders_tpu.ops.coder import decode_interleaved, encode_interleaved
from entropy_coders_tpu.spec.codec import fse_compress, fse_decompress
from entropy_coders_tpu.spec.fse import DecodeTable, EncodeTable
from entropy_coders_tpu.spec.histogram import NormHistogram

from conftest import gen_sequence


def spec_payload(src, k):
    """Compress with the spec codec; return (hist, header_len, frame)."""
    dst = bytearray()
    hist, _bits = fse_compress(src, dst, k=k)
    hdr = bytearray()
    hist.write(hdr)
    return hist, len(hdr), bytes(dst)


@pytest.mark.parametrize("k", [1, 2, 4, 8, 64])
@pytest.mark.parametrize("size", [1024, 1025, 1027, 4096])
def test_encode_matches_spec(k, size):
    src = gen_sequence(0.2, size)
    hist, hdr_len, frame = spec_payload(src, k)
    table = EncodeTable(hist)
    payload, bits = encode_interleaved(src, k, table, hist.log2)
    assert payload == frame[hdr_len:], f"payload mismatch k={k} size={size}"


@pytest.mark.parametrize("k", [1, 2, 4, 8, 64])
@pytest.mark.parametrize("size", [1024, 1025, 1027, 4096])
def test_decode_roundtrip(k, size):
    src = gen_sequence(0.2, size)
    hist, hdr_len, frame = spec_payload(src, k)
    table = DecodeTable(hist)
    out = decode_interleaved(frame[hdr_len:], k, table, hist.log2, max_out=size)
    assert out is not None
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), src)


@pytest.mark.parametrize("k", [2, 16])
def test_cross_jax_encode_spec_decode(k):
    src = gen_sequence(0.3, 2048)
    hist = NormHistogram.new(src)
    table = EncodeTable(hist)
    payload, _ = encode_interleaved(src, k, table, hist.log2)
    hdr = bytearray()
    hist.write(hdr)
    dec = bytearray()
    assert fse_decompress(bytes(hdr) + payload, dec, k=k) == len(src)
    np.testing.assert_array_equal(np.frombuffer(bytes(dec), np.uint8), src)


@pytest.mark.parametrize("prob", [0.05, 0.5, 0.9])
def test_decode_entropies(prob):
    src = gen_sequence(prob, 4096)
    hist, hdr_len, frame = spec_payload(src, 8)
    out = decode_interleaved(frame[hdr_len:], 8, DecodeTable(hist), hist.log2,
                             max_out=len(src))
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), src)


def test_decode_framing_errors():
    src = gen_sequence(0.2, 1024)
    hist, hdr_len, frame = spec_payload(src, 2)
    table = DecodeTable(hist)
    assert decode_interleaved(b"", 2, table, hist.log2, 1024) is None
    assert decode_interleaved(b"\x00\x00", 2, table, hist.log2, 1024) is None
    # marker not in final byte
    assert decode_interleaved(b"\x01\x00", 2, table, hist.log2, 1024) is None


def test_skewed_and_incompressible(rng):
    for src in [
        np.where(rng.random(8192) < 0.99, np.uint8(7),
                 rng.integers(0, 256, 8192, dtype=np.uint8)).astype(np.uint8),
        rng.integers(0, 256, 8192, dtype=np.uint8),
    ]:
        hist, hdr_len, frame = spec_payload(src, 32)
        payload, _ = encode_interleaved(src, 32, EncodeTable(hist), hist.log2)
        assert payload == frame[hdr_len:]
        out = decode_interleaved(payload, 32, DecodeTable(hist), hist.log2,
                                 max_out=len(src))
        np.testing.assert_array_equal(np.frombuffer(out, np.uint8), src)
