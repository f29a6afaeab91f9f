"""TPU container frame round-trip tests (format: FORMAT.md)."""

import numpy as np
import pytest

from entropy_coders_tpu import frame as F

from conftest import gen_sequence


@pytest.mark.parametrize("shared", [False, True])
@pytest.mark.parametrize("size", [1 << 15, (1 << 15) + 777, 100, 1])
def test_roundtrip(shared, size):
    data = gen_sequence(0.2, size)
    comp = F.compress(data, block_size=1 << 12, k=32, shared_table=shared)
    out = F.decompress(comp)
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)


def test_roundtrip_empty():
    assert F.decompress(F.compress(b"")) == b""


def test_compresses(rng):
    data = gen_sequence(0.2, 1 << 16)
    comp = F.compress(data, block_size=1 << 13, k=64)
    assert len(comp) < len(data)
    out = F.decompress(comp)
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)


def test_rle_blocks():
    data = np.zeros(1 << 14, np.uint8)  # reference panics on this input
    comp = F.compress(data, block_size=1 << 12, k=32)
    assert len(comp) < 200
    out = F.decompress(comp)
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)


def test_raw_blocks(rng):
    data = rng.integers(0, 256, 1 << 13, dtype=np.uint8)  # incompressible-ish
    comp = F.compress(data, block_size=1 << 12, k=32)
    out = F.decompress(comp)
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)


def test_mixed_entropy_blocks(rng):
    parts = [
        gen_sequence(0.1, 1 << 12),
        rng.integers(0, 256, 1 << 12, dtype=np.uint8),
        np.full(1 << 12, 42, np.uint8),
        gen_sequence(0.9, 3000),
    ]
    data = np.concatenate(parts)
    for shared in (False, True):
        comp = F.compress(data, block_size=1 << 12, k=16, shared_table=shared)
        out = F.decompress(comp)
        np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)


def test_corrupt_frame_rejected():
    data = gen_sequence(0.2, 1 << 13)
    comp = bytearray(F.compress(data, block_size=1 << 12, k=32))
    comp[len(comp) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        # either framing/length mismatch or header parse error
        F.decompress(bytes(comp))


def test_bad_magic():
    with pytest.raises(ValueError):
        F.decompress(b"NOPE" + b"\x00" * 30)


def test_shared_table_is_smaller_for_many_blocks():
    data = gen_sequence(0.2, 1 << 16)
    per_block = F.compress(data, block_size=1 << 12, k=32, shared_table=False)
    shared = F.compress(data, block_size=1 << 12, k=32, shared_table=True)
    assert len(shared) < len(per_block)
