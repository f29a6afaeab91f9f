"""C++ native host codec: byte-identical frames vs the spec, round trips,
and header/normalize utilities."""

import numpy as np
import pytest

from entropy_coders_tpu import native
from entropy_coders_tpu.spec.codec import fse_compress, fse_decompress
from entropy_coders_tpu.spec.histogram import Histogram, NormHistogram

from conftest import gen_sequence

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native codec unavailable")


@pytest.mark.parametrize("k", [1, 2, 4, 16])
@pytest.mark.parametrize("size", [1024, 1025, 1027, 1 << 15])
def test_native_matches_spec(k, size):
    src = gen_sequence(0.2, size)
    nat = native.compress(src.tobytes(), k=k)
    ref = bytearray()
    fse_compress(src, ref, k=k)
    assert nat == bytes(ref)
    assert native.decompress(nat, k=k, max_out=size + 16) == src.tobytes()


@pytest.mark.parametrize("prob", [0.05, 0.5, 0.9])
def test_native_cross_decode(prob):
    src = gen_sequence(prob, 4096)
    ref = bytearray()
    fse_compress(src, ref, k=2)
    assert native.decompress(bytes(ref), k=2, max_out=8192) == src.tobytes()
    nat = native.compress(src.tobytes(), k=2)
    dec = bytearray()
    assert fse_decompress(nat, dec, k=2) == len(src)
    assert bytes(dec) == src.tobytes()


def test_native_header_roundtrip():
    src = gen_sequence(0.2, 1 << 14)
    norm = NormHistogram.new(src)
    hdr = native.write_header(norm.table, norm.log2, norm.table_len)
    spec_hdr = bytearray()
    norm.write(spec_hdr)
    assert hdr == bytes(spec_hdr)
    table, log2, tl, nbytes = native.read_header(hdr + b"tail")
    assert nbytes == len(hdr)
    assert log2 == norm.log2 and tl == norm.table_len
    np.testing.assert_array_equal(table, norm.table)


def test_native_normalize_matches_spec(rng):
    for prob in (0.05, 0.3, 0.9):
        src = gen_sequence(prob, 1 << 14)
        h = Histogram(src)
        table, l2 = native.normalize(h.table, h.size)
        ref = h.normalize(h.optimal_log2())
        assert l2 == ref.log2
        np.testing.assert_array_equal(table, ref.table)


def test_native_normalize_slow_path(rng):
    src = rng.integers(0, 256, 1 << 12, dtype=np.uint8)  # incompressible
    h = Histogram(src)
    table, l2 = native.normalize(h.table, h.size)
    ref = h.normalize(h.optimal_log2())
    assert l2 == ref.log2
    np.testing.assert_array_equal(table, ref.table)


def test_native_rejects_garbage():
    with pytest.raises(ValueError):
        native.decompress(b"\xff\xff\xff\xff", k=1, max_out=64)
    with pytest.raises(ValueError):
        native.normalize(np.zeros(256, np.uint32), 0)


def test_read_header_fuzz_native_vs_spec(rng):
    """Random byte strings: native and spec header readers must AGREE —
    both reject, or both parse to the identical (table, log2, consumed)
    (VERDICT r1: a shared misreading would pass the oracle suite; this
    cross-checks the two independent decoders on arbitrary inputs).
    Valid-looking prefixes are rare in pure noise, so also fuzz
    mutations of real headers (higher parse-success density)."""
    real = []
    for prob in (0.05, 0.3, 0.8):
        norm = NormHistogram.new(gen_sequence(prob, 1 << 12, seed=int(prob * 100)))
        hdr = bytearray()
        norm.write(hdr)
        real.append(bytes(hdr))

    def one(buf: bytes):
        try:
            nt, nl2, _tl, nn = native.read_header(buf)
            nat = (nt.tolist(), nl2, nn)
        except ValueError:
            nat = None
        try:
            snorm, rest = NormHistogram.read(buf)
            sp = (np.asarray(snorm.table, np.int32).tolist(), snorm.log2,
                  len(buf) - len(rest))
        except Exception:
            sp = None
        assert nat == sp, (buf.hex(), nat if nat else "reject",
                           sp if sp else "reject")

    for t in range(150):
        n = int(rng.integers(1, 40))
        one(rng.integers(0, 256, n, dtype=np.uint8).tobytes())
    for t in range(150):
        base = bytearray(real[t % len(real)] + b"xx")
        pos = int(rng.integers(0, len(base)))
        base[pos] ^= int(rng.integers(1, 256))
        one(bytes(base))


def test_native_single_symbol_rejected():
    """Mirror of spec: single-symbol (degenerate full-table) inputs and
    frames are refused — the reference's own decoder would never
    terminate on them (see spec.codec.fse_compress docstring)."""
    with pytest.raises(ValueError):
        native.compress(b"\x09" * 18, k=1)
    with pytest.raises(ValueError):
        native.decompress(bytes.fromhex("10de1f20"), k=1, max_out=64)


def test_committed_library_is_portable():
    """The committed/shipped libfse_native.so must be a PORTABLE build:
    dlopen accepts a binary with unsupported vector extensions and the
    process then dies with an uncatchable SIGILL at the first call, so
    an arch-tuned binary must never be committed (tuned builds go to the
    gitignored .local.so — native/build.py). Guard: no AVX-512/AMX
    instructions in the disassembly (skips when objdump is missing)."""
    import shutil
    import subprocess

    from entropy_coders_tpu.native.build import LIB

    if not LIB.exists():
        pytest.skip("no committed native library")
    if not shutil.which("objdump"):
        pytest.skip("objdump unavailable")
    dis = subprocess.run(["objdump", "-d", str(LIB)],
                         capture_output=True, text=True, check=True).stdout
    bad = [ln for ln in dis.splitlines()
           if any(tok in ln for tok in ("%zmm", "vpternlog", "%tmm"))]
    assert not bad, f"arch-specific instructions in committed .so: {bad[:3]}"


@pytest.mark.parametrize("L", [5, 8, 9, 10, 12, 13, 15])
def test_native_table_builds_match_spec(L):
    """ect_build_{encode,decode}_tables must be bit-identical to the spec
    table builds (spec.fse) for every table log — the frame path ships
    these host-built tables to the device kernels (pl_coder host_tables
    route), so a divergence would corrupt frames silently."""
    if not native.available():
        pytest.skip("native codec unavailable")
    from entropy_coders_tpu.spec.fse import DecodeTable, EncodeTable
    from entropy_coders_tpu.spec.histogram import Histogram

    rng = np.random.default_rng(L)
    built = 0
    for _ in range(8):
        # the table_len clamp raises log2 to ilog2(table_len-1)+2, so the
        # alphabet must stay under ~2^(L-2) for normalize(L) to keep L
        a = int(rng.integers(3, min(1 << (L - 2), 257)))
        data = np.minimum(rng.geometric(0.25, 4096) - 1, a - 1).astype(
            np.uint8)
        try:
            h = Histogram(data).normalize(L)
        except ValueError:
            continue
        if h.log2 != L:
            continue
        nt = np.asarray(h.table, np.int32)[None]
        et, dt = EncodeTable(h), DecodeTable(h)
        t, tb, fs = native.build_encode_tables(nt, L)
        assert (t[0] == np.asarray(et.table)).all()
        assert (tb[0] == np.asarray(et.tt_bits, np.uint32)).all()
        assert (fs[0] == np.asarray(et.tt_find_state, np.int32)).all()
        pk = native.build_decode_tables(nt, L)
        assert (pk[0] == np.asarray(dt.packed, np.uint32)).all()
        built += 1
    assert built >= 2  # the parametrized log must actually get exercised


def test_native_table_builds_reject_malformed():
    """Malformed normalized tables (mass not summing to 2^log2, counts
    out of range, single-symbol) must return a clean error, never write
    out of bounds (found by round-4 code review: an unvalidated table
    drove heap corruption)."""
    if not native.available():
        pytest.skip("native codec unavailable")
    bad = np.zeros((1, 256), np.int32)
    bad[0, :8] = 128  # sums to 1024, table size 256
    for builder in (lambda t: native.build_encode_tables(t, 8),
                    lambda t: native.build_decode_tables(t, 8)):
        with pytest.raises(ValueError):
            builder(bad)
        over = np.zeros((1, 256), np.int32)
        over[0, 0] = 300  # count > 2^log2
        over[0, 1] = -44
        with pytest.raises(ValueError):
            builder(over)
        short = np.zeros((1, 256), np.int32)
        short[0, 3] = 100  # sums below 2^log2
        with pytest.raises(ValueError):
            builder(short)
    # a single symbol holding the whole table is DEGENERATE but
    # memory-safe and spec.fse builds it too (the codec layers reject it
    # separately — spec.codec / ect_compress) — builders must accept it
    single = np.zeros((1, 256), np.int32)
    single[0, 7] = 256
    native.build_encode_tables(single, 8)
    native.build_decode_tables(single, 8)
