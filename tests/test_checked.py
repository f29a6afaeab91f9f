"""Checkify sanitizer mode (utils.checked): the XLA coding cores run
with index/NaN/div checks instrumented and still produce bit-identical
output — the JAX analog of running the reference under its debug-build
asserts (reference: src/bitstream/writer.rs:142-145)."""

import numpy as np
import pytest

from entropy_coders_tpu.spec.codec import fse_compress
from entropy_coders_tpu.spec.fse import DecodeTable, EncodeTable
from entropy_coders_tpu.utils.checked import (checked_decode_interleaved,
                                              checked_encode_interleaved)

from conftest import gen_sequence


@pytest.mark.parametrize("k", [2, 64])
def test_checked_roundtrip_matches_unchecked(k):
    src = gen_sequence(0.2, 4096)
    dst = bytearray()
    hist, _ = fse_compress(src, dst, k=k)
    hdr = bytearray()
    hist.write(hdr)
    payload, bits = checked_encode_interleaved(src, k, EncodeTable(hist),
                                               hist.log2)
    assert payload == bytes(dst)[len(hdr):]
    out = checked_decode_interleaved(payload, k, DecodeTable(hist),
                                     hist.log2, max_out=len(src))
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), src)


def test_checked_decode_survives_corruption():
    """Corrupted payloads under the sanitizer either decode (wrong bytes
    are in-contract without checksums) or raise a clean error — no
    silent OOB access can hide behind XLA's clamping semantics."""
    from jax.experimental.checkify import JaxRuntimeError

    src = gen_sequence(0.2, 2048)
    dst = bytearray()
    hist, _ = fse_compress(src, dst, k=2)
    hdr = bytearray()
    hist.write(hdr)
    payload = bytes(dst)[len(hdr):]
    rng = np.random.default_rng(5)
    table = DecodeTable(hist)
    for _ in range(25):
        bad = bytearray(payload)
        bad[int(rng.integers(0, len(bad)))] ^= int(rng.integers(1, 256))
        try:
            out = checked_decode_interleaved(bytes(bad), 2, table,
                                             hist.log2, max_out=len(src))
            assert out is None or isinstance(out, bytes)
        except (ValueError, JaxRuntimeError):
            pass
