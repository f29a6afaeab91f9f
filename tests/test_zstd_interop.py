"""Independent wire-format evidence: real zstd frames as a third-party
oracle for the histogram header (FSE table description) codec.

Every other oracle in this repo (spec, C++ native, golden vectors) is
same-author. The reference's header format is zstd's ``FSE_writeNCount``
output (reference src/histogram.rs:342-375 says so explicitly), and the
installed `zstandard` package wraps the upstream C library — an
implementation with zero shared code or authorship with this repo. These
tests compress corpora with it, walk the resulting frames per RFC 8878
(tests/zstd_walk.py), slice out every FSE_Compressed NCount byte range
from the sequences sections, and assert:

  1. ``NormHistogram.read`` parses each one (valid distribution, exact
     power-of-two sum, correct table_len);
  2. ``NormHistogram.write`` re-emits the *identical bytes* zstd wrote;
  3. the native C++ reader/writer agree byte-for-byte on the same input.

If the spec + native implementations shared a systematic format error,
they could not round-trip bytes produced by upstream zstd."""

import numpy as np
import pytest

zstandard = pytest.importorskip("zstandard")

from entropy_coders_tpu import native
from entropy_coders_tpu.spec.histogram import NormHistogram
from tests.zstd_walk import walk_frame


def _corpora():
    """Corpora chosen to produce varied sequence-length distributions
    (hence varied NCount tables) when zstd compresses them."""
    rng = np.random.default_rng(42)
    out = []
    # text-like: many short matches of varied lengths
    words = [bytes(rng.integers(97, 123, int(n)).astype(np.uint8))
             for n in rng.integers(3, 12, 200)]
    out.append(b" ".join(words[int(i)] for i in rng.integers(0, 200, 30000)))
    # structured binary: fixed-stride records with noisy fields
    rec = np.zeros((20000, 16), np.uint8)
    rec[:, :4] = rng.integers(0, 4, (20000, 4))
    rec[:, 4:8] = np.arange(20000)[:, None] & 0xFF
    rec[:, 8:] = rng.integers(0, 256, (20000, 8))
    out.append(rec.tobytes())
    # long literal runs + occasional long matches
    base = bytes(rng.integers(0, 256, 4096).astype(np.uint8))
    out.append(b"".join(base[: int(n)] for n in rng.integers(100, 4096, 300)))
    return out


def _ncount_slices():
    slices = []
    for level in (3, 10, 19):
        for data in _corpora():
            comp = zstandard.ZstdCompressor(level=level).compress(data)
            for t in walk_frame(comp):
                raw = comp[t["offset"] : t["offset"] + t["nbytes"]]
                slices.append((t["which"], raw))
    # dedupe identical table descriptions, keep order
    seen, uniq = set(), []
    for which, raw in slices:
        if raw not in seen:
            seen.add(raw)
            uniq.append((which, raw))
    return uniq


@pytest.fixture(scope="module")
def ncount_slices():
    s = _ncount_slices()
    # the test is vacuous unless the corpora actually produced
    # FSE_Compressed tables; require a healthy sample
    assert len(s) >= 8, f"only {len(s)} NCount tables found"
    return s


def test_spec_reader_parses_real_zstd_ncounts(ncount_slices):
    for which, raw in ncount_slices:
        hist, rest = NormHistogram.read(raw + b"tail-sentinel")
        assert rest == b"tail-sentinel", (which, raw.hex())
        t = hist.table
        # exact power-of-two mass (low-prob -1 entries count 1 slot each)
        assert sum(v if v > 0 else 1 for v in t[: hist.table_len]
                   if v != 0) == 1 << hist.log2
        assert 5 <= hist.log2 <= 9  # zstd accuracy-log range
        assert t[hist.table_len - 1] != 0  # table_len is tight


def test_spec_writer_reemits_zstd_bytes_identically(ncount_slices):
    """write(read(x)) == x against upstream-produced bytes: the adaptive
    bit-width scheme has no encoder freedom, so any divergence in either
    direction shows up as a byte mismatch."""
    for which, raw in ncount_slices:
        hist, _ = NormHistogram.read(raw)
        out = bytearray()
        hist.write(out)
        assert bytes(out) == raw, (
            f"{which}: re-emitted {bytes(out).hex()} != zstd {raw.hex()}")


def test_native_reader_writer_match_zstd_bytes(ncount_slices):
    if not native.available():
        pytest.skip("native codec unavailable")
    for which, raw in ncount_slices:
        table, log2, table_len, nbytes = native.read_header(raw)
        assert nbytes == len(raw)
        spec_hist, _ = NormHistogram.read(raw)
        assert log2 == spec_hist.log2
        assert table_len == spec_hist.table_len
        assert np.array_equal(table, np.asarray(spec_hist.table))
        assert native.write_header(table, log2, table_len) == raw


def test_walker_found_all_three_table_kinds(ncount_slices):
    """Sanity on the oracle's breadth: literals-length, offset and
    match-length tables all appear (different symbol counts and shapes)."""
    kinds = {which for which, _ in ncount_slices}
    assert kinds == {"ll", "of", "ml"}, kinds
