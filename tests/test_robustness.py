"""Robustness: malformed/corrupted container frames must raise ValueError
(or subclasses) — never crash, hang, or silently return wrong lengths.

The reference's stance (SURVEY.md §5): total error handling via
Option/HistError; no checksums, so *undetectable* corruption decoding to
garbage of the right length is in-contract there. The container adds
structure (magic, lengths, lane sizes) that must be validated."""

import numpy as np
import pytest

from entropy_coders_tpu import frame as F
from entropy_coders_tpu.spec.histogram import HistError
from tests.conftest import gen_sequence


def _frame(lanes: bool):
    data = gen_sequence(0.2, 3 * 4096 + 123)
    comp = F.compress(data, block_size=4096, k=128, lanes=lanes,
                      interpret=True)
    return data, comp


@pytest.fixture(scope="module")
def pl_frame():
    return _frame(True)


@pytest.fixture(scope="module")
def xla_frame():
    return _frame(False)


def test_bad_magic(pl_frame):
    _, comp = pl_frame
    bad = b"XXXX" + comp[4:]
    with pytest.raises(ValueError):
        F.decompress(bad, interpret=True)


def test_bad_version(pl_frame):
    _, comp = pl_frame
    bad = bytearray(comp)
    bad[4] = 99
    with pytest.raises(ValueError):
        F.decompress(bytes(bad), interpret=True)


def test_truncated_frame(pl_frame):
    _, comp = pl_frame
    for cut in range(0, len(comp), max(1, len(comp) // 64)):
        with pytest.raises(ValueError):
            F.decompress(comp[:cut], interpret=True)


@pytest.mark.parametrize("which", ["pl", "xla"])
def test_random_corruption_never_crashes(which, pl_frame, xla_frame):
    """Flip random bytes across the frame; every outcome must be either a
    clean ValueError (HistError is a subclass) or a decode of the right
    length (possibly wrong bytes — no checksum by default, matching the
    reference's contract). Nothing else may escape: frame-derived
    invariants raise ValueError, never assert/KeyError/IndexError."""
    data, comp = pl_frame if which == "pl" else xla_frame
    rng = np.random.default_rng(0)
    errors = 0
    for t in range(300):
        bad = bytearray(comp)
        pos = int(rng.integers(0, len(bad)))
        bad[pos] ^= int(rng.integers(1, 256))
        try:
            out = F.decompress(bytes(bad), interpret=True)
            assert isinstance(out, bytes) and len(out) == len(data)
        except ValueError:
            errors += 1
    assert errors > 0  # sanity: corruption is actually being detected


def test_random_corruption_packed_frames():
    """Corruption fuzz over the FLAG_PACKED wire (bit-granularity lanes,
    FSE-compressed size tables): its parse path has its own validation
    and must hold the same ValueError-only contract."""
    data = gen_sequence(0.2, 3 * 4096 + 123)
    comp = F.compress(data, block_size=4096, k=128, lanes=True,
                      interpret=True, bit_pack=True)
    rng = np.random.default_rng(3)
    errors = 0
    for t in range(200):
        bad = bytearray(comp)
        pos = int(rng.integers(0, len(bad)))
        bad[pos] ^= int(rng.integers(1, 256))
        try:
            out = F.decompress(bytes(bad), interpret=True)
            assert isinstance(out, bytes) and len(out) == len(data)
        except ValueError:
            errors += 1
    assert errors > 0


def test_owned_blocks_edges():
    """Contiguous balanced split: covers all blocks exactly once, even
    with more processes than blocks."""
    from entropy_coders_tpu.parallel.multihost import owned_blocks
    for n_blocks in (0, 1, 5, 64):
        for procs in (1, 2, 3, 7, 100):
            ranges = [owned_blocks(n_blocks, procs, i) for i in range(procs)]
            covered = [b for lo, hi in ranges for b in range(lo, hi)]
            assert covered == list(range(n_blocks)), (n_blocks, procs)


def test_corrupt_headers_fuzz(pl_frame):
    """Byte flips concentrated in the frame + histogram header region
    (the most parse-heavy bytes)."""
    _, comp = pl_frame
    rng = np.random.default_rng(1)
    for t in range(200):
        bad = bytearray(comp)
        pos = int(rng.integers(0, min(160, len(bad))))
        bad[pos] ^= int(rng.integers(1, 256))
        try:
            F.decompress(bytes(bad), interpret=True)
        except ValueError:
            pass


def test_lane_sizes_tampered(pl_frame):
    """Inflated lane bit sizes must be caught (payload too short or
    cursor drain failure), not read out of bounds."""
    data, comp = pl_frame
    pf = F._parse_frame(comp)
    from entropy_coders_tpu.spec.histogram import NormHistogram
    # find the first PL block's section offset inside the frame
    assert int(pf.modes[0]) == F.MODE_FSE_PL
    sec = pf.section(0)
    _, rest = NormHistogram.read(sec)
    hdr_len = len(sec) - len(rest)
    off = comp.find(sec) + hdr_len  # lane size table offset
    bad = bytearray(comp)
    bad[off:off + 2] = (0xFFFF).to_bytes(2, "little")  # lane0: 65535 bits
    with pytest.raises(ValueError):
        F.decompress(bytes(bad), interpret=True)


def test_lane_sizes_amplification_bounded(pl_frame):
    """Sum-preserving tamper: inflate one lane's claimed bit size to near
    u16-max while deflating others so the total payload length still
    matches. The words allocation is sized from max(sz) * k * B, so
    without the (R+1)*log2 bound a small frame could demand ~1000x its
    size in host memory (and a MemoryError would escape the
    ValueError-only contract). The encoder invariant check must fire."""
    data, comp = pl_frame
    pf = F._parse_frame(comp)
    from entropy_coders_tpu.spec.histogram import NormHistogram
    assert int(pf.modes[0]) == F.MODE_FSE_PL
    sec = pf.section(0)
    _, rest = NormHistogram.read(sec)
    hdr_len = len(sec) - len(rest)
    off = comp.find(sec) + hdr_len
    k = pf.k
    sz = np.frombuffer(comp[off : off + 2 * k], "<u2").astype(np.int64)
    # move whole bytes from other lanes onto lane 0, keeping sum(ceil(sz/8))
    # and every lane >= log2 so only the amplification bound can catch it
    tampered = sz.copy()
    budget = 60000 - int(sz[0])
    for j in range(1, k):
        if budget <= 0:
            break
        give = min(int(tampered[j]) - 16 & ~7, budget & ~7)
        if give > 0:
            tampered[j] -= give
            tampered[0] += give
            budget -= give
    assert tampered[0] > 16 * (pf.block_size // k)  # far past (R+1)*log2
    assert ((tampered + 7) // 8).sum() == ((sz + 7) // 8).sum()
    bad = bytearray(comp)
    bad[off : off + 2 * k] = tampered.astype("<u2").tobytes()
    with pytest.raises(ValueError, match="bad lane sizes"):
        F.decompress(bytes(bad), interpret=True)


def test_packed_size_table_bomb_bounded():
    """A crafted low-entropy FSE stream in a FLAG_PACKED size table must
    not amplify into unbounded output on the spec-decoder fallback
    (decompression-bomb DoS): the decode aborts at the expected 2k bytes
    and raises ValueError promptly."""
    import struct
    import time
    import unittest.mock as mock

    from entropy_coders_tpu import native
    from entropy_coders_tpu.spec.histogram import NormHistogram

    t = np.zeros(256, np.int32)
    t[0] = (1 << 15) - 1
    t[1] = 1
    norm = NormHistogram.try_from(t)
    hdr = bytearray()
    norm.write(hdr)
    bomb = bytes(hdr) + b"\xff" * 60  # decodes to hundreds of KB unbounded
    sec = struct.pack("<H", len(bomb)) + bomb + b"lanes"
    for force_fallback in (False, True):
        ctx = (mock.patch.object(native, "available", lambda: False)
               if force_fallback else mock.patch.object(F, "MAGIC", F.MAGIC))
        with ctx:
            t0 = time.perf_counter()
            with pytest.raises(ValueError):
                F._unpack_size_table(sec, 128)
            assert time.perf_counter() - t0 < 5


def test_zero_and_tiny_inputs():
    assert F.decompress(F.compress(b"", lanes=False)) == b""
    for n in (1, 2, 3, 7, 15, 16, 17):
        d = bytes(range(n))
        assert F.decompress(F.compress(d, block_size=16, k=2, lanes=False)) == d


def test_rle_and_raw_blocks():
    d = b"\x00" * 5000 + bytes(np.random.default_rng(0)
                               .integers(0, 256, 5000, dtype=np.uint8))
    comp = F.compress(d, block_size=4096, k=2, lanes=False)
    pf = F._parse_frame(comp)
    assert F.MODE_RLE in pf.modes  # the all-zero block
    assert F.decompress(comp) == d
