"""Histogram/normalization oracle tests, cloned from the reference suite
(reference: src/histogram.rs:548-671): deterministic flat/uniform/exponential
distributions plus seeded random data, with the shared ``hist_verify``
oracle (sum == 2**log2, zero/nonzero preservation, header round-trip with
trailing bytes preserved)."""

import numpy as np
import pytest

from entropy_coders_tpu.constants import TABLE_LOG_MAX
from entropy_coders_tpu.spec.histogram import Histogram, NormHistogram

from conftest import gen_sequence


def hist_verify(hist: Histogram, log2: int):
    raw = hist.table.copy()
    norm = hist.normalize(log2)
    assert int(np.abs(norm.table.astype(np.int64)).sum()) == 1 << norm.log2
    for i in range(256):
        assert (raw[i] == 0) == (norm.table[i] == 0), (
            f"symbol {i}: raw {raw[i]} vs normalized {norm.table[i]}"
        )
    enc = bytearray()
    norm.write(enc)
    trailer = b"I am a test"
    enc += trailer
    dec, rem = NormHistogram.read(bytes(enc))
    assert rem == trailer
    assert dec.log2 == norm.log2
    assert dec.table_len == norm.table_len
    np.testing.assert_array_equal(dec.table, norm.table)


def test_flat_256():
    data = np.arange(256, dtype=np.uint8)
    NormHistogram.new(data)


@pytest.mark.parametrize("log2", range(8, TABLE_LOG_MAX + 1))
def test_uniform_dist_256(log2):
    reps = 1 << (log2 - 8)
    data = np.repeat(np.arange(256, dtype=np.uint8), reps)
    hist = Histogram(data)
    assert (hist.table == reps).all()
    hist_verify(hist, log2)


@pytest.mark.parametrize("log2", range(8, TABLE_LOG_MAX + 1))
def test_exp_dist(log2):
    size = 1 << log2
    remaining = size
    chunks = []
    sym = 0
    while True:
        chunks.append(np.full(remaining >> 1, sym, dtype=np.uint8))
        remaining -= remaining >> 1
        sym += 1
        if remaining == 1:
            chunks.append(np.array([sym], dtype=np.uint8))
            break
    data = np.concatenate(chunks)
    hist = Histogram(data)
    for j in range(256):
        if j < log2:
            expected = (1 << log2) >> (1 + j)
        elif j == log2:
            expected = 1
        else:
            expected = 0
        assert hist.table[j] == expected
    hist_verify(hist, log2)


@pytest.mark.parametrize("log2", range(8, TABLE_LOG_MAX + 1))
def test_rand_dist_uniform(log2, rng):
    size = 1 << (log2 + 2)
    for rep in range(4):
        data = rng.integers(0, 256, size=size, dtype=np.uint8)
        hist_verify(Histogram(data), log2)


@pytest.mark.parametrize("prob", [0.05, 0.2, 0.5, 0.9])
def test_geometric_dist(prob):
    data = gen_sequence(prob, 1 << 15)
    hist = Histogram(data)
    hist_verify(hist, hist.optimal_log2())


def test_optimal_log2_known_values():
    # 64 KiB of >=128 distinct symbols: default table log 11
    data = gen_sequence(0.005, 1 << 16)
    h = Histogram(data)
    assert h.optimal_log2() == 11
    # tiny input: log2 pinned near size
    data = np.arange(64, dtype=np.uint8)
    assert Histogram(data).optimal_log2() >= 5


def test_try_from_roundtrip():
    data = gen_sequence(0.2, 1 << 14)
    norm = NormHistogram.new(data)
    again = NormHistogram.try_from(norm.table)
    assert again.log2 == norm.log2
    assert again.table_len == norm.table_len


def test_try_from_rejects_non_power_of_two():
    t = np.zeros(256, dtype=np.int32)
    t[0] = 3
    with pytest.raises(ValueError):
        NormHistogram.try_from(t)


def test_read_rejects_garbage():
    from entropy_coders_tpu.spec.histogram import HistError

    with pytest.raises((HistError, ValueError, EOFError)):
        NormHistogram.read(b"\xff\xff\xff\xff\xff\xff")


def test_normalize_slow_path_roundtrip(rng):
    """Uniform random data over the full alphabet triggers the multi-round
    slow normalization (reference: src/histogram.rs:144-145,157-261); the
    resulting table must still round-trip the data exactly."""
    import entropy_coders_tpu.spec.histogram as H

    calls = {"n": 0}
    orig = H.Histogram._normalize_slow

    def spy(self, log2):
        calls["n"] += 1
        return orig(self, log2)

    H.Histogram._normalize_slow = spy
    try:
        src = rng.integers(0, 256, 1 << 12, dtype=np.uint8)
        h = H.Histogram(src)
        n = h.normalize(h.optimal_log2())
    finally:
        H.Histogram._normalize_slow = orig
    assert calls["n"] == 1, "distribution did not exercise the slow path"
    assert sum(1 if c == -1 else int(c) for c in n.table) == 1 << n.log2
    from entropy_coders_tpu.spec.codec import fse_compress, fse_decompress
    f, o = bytearray(), bytearray()
    fse_compress(src, f, k=2, hist=n)
    assert fse_decompress(f, o, k=2) == len(src)
    assert bytes(o) == src.tobytes()


def test_estimated_bits_tracks_actual_coded_size():
    """The "fast" policy's cost model (normalize.estimated_bits) must
    track the real spec-encoded size closely, else the policy's 0.5%
    budget is meaningless. Checked across distributions and logs: the
    estimate is within a few percent of the actual frame bits (payload
    + header; k final states and the marker excluded from both sides)."""
    import numpy as np

    from entropy_coders_tpu.normalize import estimated_bits, normalize_batch
    from entropy_coders_tpu.spec.codec import fse_compress
    from tests.conftest import gen_sequence

    rng = np.random.default_rng(7)
    inputs = [
        gen_sequence(0.2, 1 << 14),
        gen_sequence(0.6, 1 << 14),
        rng.integers(0, 50, 1 << 14).astype(np.uint8),
        np.repeat(rng.integers(0, 256, 256).astype(np.uint8), 64),
    ]
    for data in inputs:
        n = len(data)
        counts = np.bincount(data, minlength=256).astype(np.uint64)[None]
        for L in (8, 9, 10, 11):
            tables, log2s = normalize_batch(counts, n, L)
            est = float(estimated_bits(counts, tables, log2s)[0])
            from entropy_coders_tpu.spec.histogram import Histogram
            hist = Histogram(data).normalize(int(log2s[0]))
            frame = bytearray()
            _, payload_bits = fse_compress(data, frame, k=1, hist=hist)
            hdr_bits = 8 * (len(frame) - (payload_bits + 7) // 8)
            actual = payload_bits + hdr_bits - int(log2s[0]) - 1
            assert abs(est - actual) / actual < 0.05, (
                f"estimator off: est={est} actual={actual} L={log2s[0]}")


def test_normalize_exact_past_u32_counts():
    """Aggregated histograms (multi-host shared tables over > 4 GiB
    total input) carry per-symbol counts past u32; the batch normalizer
    and the shared-table resolver must stay int64/uint64-exact instead
    of wrapping (regression: counts were cast to uint32 on the way in,
    silently mis-weighting or zeroing symbols)."""
    from entropy_coders_tpu import frame as F
    from entropy_coders_tpu.normalize import normalize_batch

    c = np.zeros(256, np.int64)
    c[0] = 3 << 32            # 12 GiB of symbol 0
    c[1] = 1 << 32            # 4 GiB of symbol 1
    c[2] = 5                  # a trace symbol (u32-wrapped counts would
    total = int(c.sum())      # make it dominate or vanish)
    tables, log2s = normalize_batch(c[None], total, 10)
    t, L = tables[0], int(log2s[0])
    # slot accounting: a -1 low-prob sentinel owns exactly 1 table slot
    assert np.where(t > 0, t, (t == -1).astype(np.int64)).sum() == 1 << L
    # 3:1 mass split must survive; the trace symbol is low-prob (-1)
    assert t[1] > 0 and abs(t[0] / t[1] - 3.0) < 0.05
    assert t[2] == -1
    assert (t[3:] == 0).all()

    s = F.resolve_shared_table(c, total, 10, lanes=False)
    assert s is not None and np.array_equal(s[0], t) and s[1] == L

    # u32-multiple wrap-to-zero case: symbol with count 2^32 must NOT
    # disappear from the resolved table
    c2 = np.zeros(256, np.int64)
    c2[7] = 1 << 32
    c2[9] = 1 << 32
    s2 = F.resolve_shared_table(c2, int(c2.sum()), 8, lanes=False)
    assert s2 is not None and s2[0][7] > 0 and s2[0][9] > 0
