"""Bit-I/O property tests, cloned from the reference's strongest suite
(reference: src/bitstream/mod.rs:17-225): encode a list of (value, width)
fields, decode back via both readers, check exact lengths, drained state,
and byte offsets 0-7 of prepended data."""

import numpy as np
import pytest

from entropy_coders_tpu.spec.bitstream import (
    BitStackReader,
    BitStackWriter,
    BitStreamReader,
)


def encode(test_vec, mark: bool, offset: int):
    out = bytearray(b"\x00" * offset)
    enc = BitStackWriter(out)
    total_bits = 0
    for val, bits in test_vec:
        total_bits += bits
        enc.write_bits(val, bits)
    if mark:
        enc.write_bits(1, 1)
        written = enc.finish() - 1
    else:
        written = enc.finish()
    assert total_bits == written
    total_bytes = (total_bits + int(mark) + 7) // 8
    assert len(out) == total_bytes + offset
    return bytes(out), total_bits


def decode_stack(encoded, test_vec):
    dec = BitStackReader.new(encoded)
    assert dec is not None
    for val, bits in reversed(test_vec):
        got = dec.read(bits)
        assert got == val
    assert dec.available() == 0
    assert dec.finish()


def decode_stream(encoded, total_bits, test_vec):
    dec = BitStreamReader(encoded, total_bits)
    for val, bits in test_vec:
        assert dec.read(bits) == val
    assert dec.available() == 0


@pytest.mark.parametrize("offset", range(8))
def test_stack_alternating_bits(offset):
    test_vec = []
    for i in range(160):
        test_vec.append((i & 1, 1))
        enc, _ = encode(test_vec, True, offset)
        decode_stack(enc[offset:], test_vec)


@pytest.mark.parametrize("offset", range(8))
def test_stack_random_widths(offset, rng):
    for _ in range(10):
        test_vec = []
        for _ in range(100):
            bits = int(rng.integers(1, 17))
            val = int(rng.integers(0, 1 << bits))
            test_vec.append((val, bits))
            enc, _ = encode(test_vec, True, offset)
            decode_stack(enc[offset:], test_vec)


@pytest.mark.parametrize("offset", range(8))
def test_stream_alternating_bits(offset):
    test_vec = []
    for i in range(128):
        test_vec.append((i & 1, 1))
        enc, total_bits = encode(test_vec, False, offset)
        decode_stream(enc[offset:], total_bits, test_vec)


@pytest.mark.parametrize("offset", range(8))
def test_stream_random_widths(offset, rng):
    for _ in range(10):
        test_vec = []
        for _ in range(100):
            bits = int(rng.integers(1, 17))
            val = int(rng.integers(0, 1 << bits))
            test_vec.append((val, bits))
            enc, total_bits = encode(test_vec, False, offset)
            decode_stream(enc[offset:], total_bits, test_vec)


def test_stack_framing_errors():
    # all-zero buffer: no marker bit
    assert BitStackReader.new(b"\x00\x00") is None
    # marker not in the final byte: dead byte at the end
    assert BitStackReader.new(b"\x01\x00") is None
    # empty buffer
    assert BitStackReader.new(b"") is None
    # bare marker: valid, zero readable bits
    r = BitStackReader.new(b"\x01")
    assert r is not None and r.available() == 0 and r.finish()


def test_stack_zero_bit_reads():
    r = BitStackReader.new(b"\x01")
    # 0-bit reads succeed on an empty stack (reference peek(0) semantics)
    assert r.read(0) == 0
    assert r.read(1) is None


def test_reference_variant_methods():
    """The reference's unsafe/no-reload/unmasked variants exist and agree
    with the checked paths (they differ only in unsafe contracts that a
    Python bigint implementation cannot violate)."""
    from entropy_coders_tpu.spec.bitstream import BitStackReader, BitStackWriter

    out = bytearray()
    w = BitStackWriter(out)
    w.write_bits(0b101, 3)
    w.write_bits_unmasked(0b11, 2)
    w.write_bits_raw(0x7FFF, 15)
    w.write_bits_raw_unmasked(1, 1)
    w.flush()
    w.write_bits(1, 1)  # marker
    total = w.finish()
    assert total == 22
    r = BitStackReader.new(bytes(out))
    assert r is not None
    assert r.read_no_reload(1) == 1
    assert r.peek(15) == 0x7FFF
    r.advance_no_reload(15)
    r.reload()
    assert r.read(2) == 0b11
    assert r.read(3) == 0b101
    assert r.finish()
