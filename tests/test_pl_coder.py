"""Exactness tests for the per-lane-stream Pallas kernels (ops.pl_coder).

Run in Pallas interpreter mode on the CPU backend; the same kernels are
verified on real TPU hardware by bench.py / scratch checks. The oracle is
``spec``: each lane's bit stream must be bit-identical to the reference
encoder run on that lane's strided subsequence (reference semantics:
src/lib.rs:112-143 per lane)."""

import numpy as np
import pytest

from entropy_coders_tpu.ops import pl_coder as PL
from entropy_coders_tpu.spec.bitstream import BitStackWriter
from entropy_coders_tpu.spec.fse import DecodeTable, EncodeTable, Encoder
from entropy_coders_tpu.spec.histogram import Histogram, NormHistogram


def oracle_lane_stream(seq, enc: EncodeTable):
    """Reference-format single-stream payload for one lane (no header, no
    marker bit): reversed consume, init folds the last byte, finish appends
    the final state in table_log bits."""
    out = bytearray()
    w = BitStackWriter(out)
    e = Encoder.new_first_symbol(enc, int(seq[-1]))
    for b in seq[-2::-1]:
        e.encode(w, int(b))
    e.finish(w)
    bits = w.finish()
    return bytes(out), bits


def _mk(seed, B, k, Q, gen):
    rng = np.random.default_rng(seed)
    n = k * Q
    datas = [gen(rng, n) for _ in range(B)]
    hists = [NormHistogram.new(d) for d in datas]
    return datas, hists


def _oracle_blocks(datas, hists, k):
    Ls = [h.log2 for h in hists]
    L = Ls[0]
    assert all(x == L for x in Ls)
    encs, packs, words_list, sizes_list = [], [], [], []
    for data, hist in zip(datas, hists):
        enc, dec = EncodeTable(hist), DecodeTable(hist)
        encs.append((enc.table, enc.tt_bits, enc.tt_find_state))
        packs.append(dec.packed)
        lane_payloads, lane_bits = [], []
        for i in range(k):
            p, bits = oracle_lane_stream(data[i::k], enc)
            lane_payloads.append(p)
            lane_bits.append(bits)
        w, W = PL.lane_split(b"".join(lane_payloads), np.array(lane_bits), k)
        words_list.append(w)
        sizes_list.append(np.array(lane_bits, np.int32))
    W = max(w.shape[0] for w in words_list)
    words = np.zeros((len(datas), W, k), np.uint32)
    for b, w in enumerate(words_list):
        words[b, : w.shape[0]] = w
    return L, encs, np.stack(packs), words, np.stack(sizes_list)


def geo(rng, n):
    return (rng.integers(0, 40, n, dtype=np.uint16) ** 2 % 251).astype(np.uint8)


def narrow(rng, n):
    return rng.integers(0, 4, n, dtype=np.uint8)


@pytest.mark.parametrize("gen,Q", [(geo, 16), (narrow, 9)])
def test_decode_lanes_bit_exact(gen, Q):
    B, k = 2, 256
    datas, hists = _mk(7, B, k, Q, gen)
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    R = Q - 1
    syms, finals = PL.decode_lanes(words, sizes, packs, k=k, L=L, R=R,
                                   interpret=True)
    for b, data in enumerate(datas):
        got = np.concatenate([syms[b].reshape(-1), finals[b]])
        assert got.tobytes() == data.tobytes()


@pytest.mark.parametrize("gen,Q", [(geo, 16), (narrow, 9)])
def test_encode_lanes_bit_exact(gen, Q):
    B, k = 2, 256
    datas, hists = _mk(11, B, k, Q, gen)
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    R = Q - 1
    syms_in = np.stack([d[: R * k].reshape(R, k) for d in datas])
    init_syms = np.stack([d[R * k:] for d in datas])
    We = PL.encode_w_bound(R, L)
    kw, ks = PL.encode_lanes(syms_in, init_syms, encs, k=k, L=L, W=We,
                             interpret=True)
    assert (ks == sizes).all()
    for b in range(B):
        got = PL.lane_merge(kw[b], ks[b])
        pad = np.zeros((We - words.shape[1], k), np.uint32)
        expect = PL.lane_merge(np.concatenate([words[b], pad]), sizes[b])
        assert got == expect


@pytest.mark.parametrize("L", [5, 6, 8])
def test_pl_small_table_log_bit_exact(L):
    """Tiny table logs: the pair/quad split tables pad below one 128-wide
    row (and the encode pair table likewise) — both kernels must stay
    bit-exact vs the spec oracle."""
    B, k, Q = 1, 128, 6
    rng = np.random.default_rng(L)
    data = rng.integers(0, 3, k * Q).astype(np.uint8)  # tiny alphabet
    hist = Histogram(data).normalize(L)
    assert hist.log2 == L
    L2, encs, packs, words, sizes = _oracle_blocks([data], [hist], k)
    R = Q - 1
    syms, finals = PL.decode_lanes(words, sizes, packs, k=k, L=L, R=R,
                                   interpret=True)
    got = np.concatenate([np.asarray(syms)[0].reshape(-1),
                          np.asarray(finals)[0]])
    assert got.tobytes() == data.tobytes()
    We = PL.encode_w_bound(R, L)
    kw, ks = PL.encode_lanes(data[: R * k].reshape(1, R, k),
                             data[R * k:].reshape(1, k), encs, k=k, L=L,
                             W=We, interpret=True)
    assert (np.asarray(ks) == sizes).all()
    assert PL.lane_merge(np.asarray(kw)[0], sizes[0]) == \
        PL.lane_merge(words[0], sizes[0])


@pytest.mark.parametrize("L", [13, 15])
def test_pl_high_table_log_bit_exact(L):
    """table_log 13-15 on the flagship path (reference supports the full
    5..15 range in every code path, src/fse.rs:103-106). Encode uses the
    two-plane symbol transform above L=12."""
    B, k, Q = 1, 128, 5
    rng = np.random.default_rng(L)
    data = rng.integers(0, 256, k * Q, dtype=np.uint8)
    hist = Histogram(data).normalize(L)
    assert hist.log2 == L
    L2, encs, packs, words, sizes = _oracle_blocks([data], [hist], k)
    assert L2 == L
    R = Q - 1
    syms, finals = PL.decode_lanes(words, sizes, packs, k=k, L=L, R=R,
                                   interpret=True)
    got = np.concatenate([np.asarray(syms)[0].reshape(-1),
                          np.asarray(finals)[0]])
    assert got.tobytes() == data.tobytes()
    syms_in = data[: R * k].reshape(1, R, k)
    init_syms = data[R * k:].reshape(1, k)
    We = PL.encode_w_bound(R, L)
    kw, ks = PL.encode_lanes(syms_in, init_syms, encs, k=k, L=L, W=We,
                             interpret=True)
    assert (np.asarray(ks) == sizes).all()
    assert PL.lane_merge(np.asarray(kw)[0], sizes[0]) == \
        PL.lane_merge(words[0], sizes[0])


def test_norm_entry_points_match_host_tables():
    """encode_lanes_norm / decode_lanes_norm (device-built tables) produce
    byte-identical streams to the host-table entry points / spec oracle."""
    B, k, Q = 2, 256, 9
    datas, hists = _mk(21, B, k, Q, geo)
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    R = Q - 1
    blocks = np.stack(datas)
    norm_tables = np.stack([np.asarray(h.table, np.int32) for h in hists])
    We = PL.encode_w_bound(R, L)
    w1, s1 = PL.encode_lanes_norm(blocks, norm_tables, k=k, L=L, W=We,
                                  interpret=True)
    assert (s1 == sizes).all()
    for b in range(B):
        assert PL.lane_merge(w1[b], s1[b]) == PL.lane_merge(words[b],
                                                            sizes[b])
    syms, finals = PL.decode_lanes_norm(words, sizes, norm_tables, k=k,
                                        L=L, R=R, interpret=True)
    for b, data in enumerate(datas):
        got = np.concatenate([np.asarray(syms)[b].reshape(-1),
                              np.asarray(finals)[b]])
        assert got.tobytes() == data.tobytes()


def test_small_alphabet_fast_path_bit_exact():
    """Small-alphabet encode fast path (every symbol < 128: the transform
    table packs into ONE gather row per plane instead of two) must be
    bit-identical to the full packing and to the spec oracle, through
    both the host-table entry (explicit small_alpha=True) and the norm
    entry (auto-detected from the norm tables)."""
    B, k, Q = 2, 256, 9
    datas, hists = _mk(33, B, k, Q, narrow)
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    R = Q - 1
    syms_in = np.stack([d[: R * k].reshape(R, k) for d in datas])
    init_syms = np.stack([d[R * k:] for d in datas])
    We = PL.encode_w_bound(R, L)
    kw, ks = PL.encode_lanes(syms_in, init_syms, encs, k=k, L=L, W=We,
                             interpret=True, small_alpha=True)
    assert (np.asarray(ks) == sizes).all()
    for b in range(B):
        pad = np.zeros((We - words.shape[1], k), np.uint32)
        expect = PL.lane_merge(np.concatenate([words[b], pad]), sizes[b])
        assert PL.lane_merge(np.asarray(kw)[b], ks[b]) == expect
    # norm entry point: detection is automatic (all counts >= 128 are 0)
    blocks = np.stack(datas)
    norm_tables = np.stack([np.asarray(h.table, np.int32) for h in hists])
    assert (norm_tables[:, 128:] == 0).all()
    w1, s1 = PL.encode_lanes_norm(blocks, norm_tables, k=k, L=L, W=We,
                                  interpret=True)
    assert (s1 == sizes).all()
    for b in range(B):
        assert PL.lane_merge(w1[b], s1[b]) == PL.lane_merge(
            np.concatenate([words[b],
                            np.zeros((We - words.shape[1], k), np.uint32)]),
            sizes[b])


@pytest.mark.parametrize("L", [5, 7, 8, 9, 10, 11, 13])
def test_upacked_decode_rows_bit_exact(L):
    """The u-packed small-alphabet decode layout (sym|u u16 pairs,
    nb/base recomputed from the spread-source state u in-kernel —
    decode_table_rows ``small``; ONE gather row at L=8, and since the
    round-5 generalization any L whose max count fits 256, including
    past the L=12 split-layout ceiling) decodes bit-exactly vs the
    spec oracle and vs the split/flat layout, through decode_lanes
    (auto-detected), both decode_lanes_norm table routes, and the
    frame path."""
    B, k, Q = 2, 256, 9
    rng = np.random.default_rng(900 + L)
    # eligibility needs max normalized count <= 256: a 6-symbol alphabet
    # qualifies through L=10 (~2^L/6 each); higher logs need >= 2^L/256
    # symbols, so widen to 101
    nsym = 6 if L <= 10 else 101
    datas = [rng.integers(0, nsym, k * Q, dtype=np.uint8)
             for _ in range(B)]
    hists = [Histogram(d).normalize(L) for d in datas]
    assert all(h.log2 == L for h in hists)
    _, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    R = Q - 1
    # layout check: u-packed rows are strictly fewer (1 vs 2 at L <= 8,
    # 2 vs 3 at L=9)
    assert PL.upack_ok_packed(packs, L)
    small_rows = PL.decode_table_rows(packs[0], L, small=True)
    split_rows = PL.decode_table_rows(packs[0], L, small=False)
    assert small_rows.shape[0] == max(1, (1 << L) >> 8)
    assert small_rows.shape[0] < split_rows.shape[0]
    # decode_lanes auto-detects small from the packed syms
    syms, finals = PL.decode_lanes(words, sizes, packs, k=k, L=L, R=R,
                                   interpret=True)
    for b in range(B):
        got = np.concatenate([syms[b].reshape(-1), finals[b]])
        np.testing.assert_array_equal(got, datas[b])
    norm_tables = np.stack([np.asarray(h.table, np.int32) for h in hists])
    for ht in (True, False):
        s2, f2 = PL.decode_lanes_norm(words, sizes, norm_tables, k=k,
                                      L=L, R=R, interpret=True,
                                      host_tables=ht)
        np.testing.assert_array_equal(s2, np.asarray(syms))
        np.testing.assert_array_equal(f2, np.asarray(finals))
    # frame path end to end at the forced log
    from entropy_coders_tpu import frame as F
    data = np.concatenate(datas)
    comp = F.compress(data, block_size=k * Q, k=k, table_log=L,
                      lanes=True, interpret=True)
    assert F.decompress(comp, interpret=True) == data.tobytes()


def test_upack_majority_symbol_falls_back():
    """At L=9 a symbol holding more than half the table forces nb=0
    entries (u >= 512), so upack_ok must refuse and the split layout
    must carry the batch — decode stays exact either way."""
    k, Q, L = 256, 9, 9
    rng = np.random.default_rng(77)
    # ~70% one symbol: its normalized count exceeds 2^(L-1) = 256
    data = np.where(rng.random(k * Q) < 0.7, 3,
                    rng.integers(0, 6, k * Q)).astype(np.uint8)
    hist = Histogram(data).normalize(L)
    assert hist.log2 == L and int(np.max(hist.table)) > 256
    _, encs, packs, words, sizes = _oracle_blocks([data], [hist], k)
    assert not PL.upack_ok_packed(packs, L)
    assert not PL.upack_ok(np.asarray(hist.table, np.int32)[None], L)
    syms, finals = PL.decode_lanes(words, sizes, packs, k=k, L=L,
                                   R=Q - 1, interpret=True)
    got = np.concatenate([syms[0].reshape(-1), finals[0]])
    np.testing.assert_array_equal(got, data)


@pytest.mark.parametrize("L", [11, 13])
def test_small_alphabet_fast_path_high_logs(L):
    """Small-alphabet packing at the mid (packed-word) and two-plane
    transform layouts (L >= 11) stays bit-exact vs the spec oracle."""
    k, Q = 128, 6
    rng = np.random.default_rng(100 + L)
    data = (rng.integers(0, 10, k * Q, dtype=np.uint16) ** 2 % 97).astype(
        np.uint8)  # alphabet well under 128
    hist = Histogram(data).normalize(L)
    assert hist.log2 == L
    _, encs, packs, words, sizes = _oracle_blocks([data], [hist], k)
    R = Q - 1
    We = PL.encode_w_bound(R, L)
    kw, ks = PL.encode_lanes(data[: R * k].reshape(1, R, k),
                             data[R * k:].reshape(1, k), encs, k=k, L=L,
                             W=We, interpret=True, small_alpha=True)
    assert (np.asarray(ks) == sizes).all()
    assert PL.lane_merge(np.asarray(kw)[0], sizes[0]) == \
        PL.lane_merge(words[0], sizes[0])


def test_norm_entry_table_routes_identical():
    """The two table-build routes of encode_lanes_norm/decode_lanes_norm
    (host C++ build shipping packed rows vs the on-device XLA build)
    must produce byte-identical streams and decodes."""
    from entropy_coders_tpu import native

    if not native.available():
        pytest.skip("native codec unavailable")
    B, k, Q = 2, 256, 9
    datas, hists = _mk(55, B, k, Q, geo)
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    R = Q - 1
    blocks = np.stack(datas)
    norm_tables = np.stack([np.asarray(h.table, np.int32) for h in hists])
    We = PL.encode_w_bound(R, L)
    wh, sh = PL.encode_lanes_norm(blocks, norm_tables, k=k, L=L, W=We,
                                  interpret=True, host_tables=True)
    wd, sd = PL.encode_lanes_norm(blocks, norm_tables, k=k, L=L, W=We,
                                  interpret=True, host_tables=False)
    assert (np.asarray(sh) == np.asarray(sd)).all()
    for b in range(B):
        assert PL.lane_merge(np.asarray(wh)[b], np.asarray(sh)[b]) == \
            PL.lane_merge(np.asarray(wd)[b], np.asarray(sd)[b])
        assert (np.asarray(sh)[b] == sizes[b]).all()  # and == oracle
    for ht in (True, False):
        syms, finals = PL.decode_lanes_norm(words, sizes, norm_tables,
                                            k=k, L=L, R=R, interpret=True,
                                            host_tables=ht)
        for b, data in enumerate(datas):
            got = np.concatenate([np.asarray(syms)[b].reshape(-1),
                                  np.asarray(finals)[b]])
            assert got.tobytes() == data.tobytes()


def test_packed_encode_path_bit_exact():
    """The packed encode entry (_encode_call_packed: BlockSpecs over the
    raw (B, R+1, S, 128) block reshape, F == 1 and R % E == 0) and the
    host-table decode fast path must stay bit-exact vs the spec oracle
    and the slicing/device routes."""
    from entropy_coders_tpu import native

    if not native.available():
        pytest.skip("native codec unavailable")
    B, k, Q = 1, 1024, 10  # R = 9 divides E=3; F = 1 at this (B, k)
    datas, hists = _mk(77, B, k, Q, geo)
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    R = Q - 1
    assert R % 3 == 0
    blocks = np.stack(datas)
    norm_tables = np.stack([np.asarray(h.table, np.int32) for h in hists])
    We = PL.encode_w_bound(R, L)
    wh, sh = PL.encode_lanes_norm(blocks, norm_tables, k=k, L=L, W=We,
                                  interpret=True, host_tables=True)
    assert (np.asarray(sh) == sizes).all()
    pad = np.zeros((We - words.shape[1], k), np.uint32)
    expect = PL.lane_merge(np.concatenate([words[0], pad]), sizes[0])
    assert PL.lane_merge(np.asarray(wh)[0], np.asarray(sh)[0]) == expect
    syms, finals = PL.decode_lanes_norm(words, sizes, norm_tables, k=k,
                                        L=L, R=R, interpret=True,
                                        host_tables=True)
    got = np.concatenate([np.asarray(syms)[0].reshape(-1),
                          np.asarray(finals)[0]])
    assert got.tobytes() == datas[0].tobytes()


def test_pl_lane_is_reference_stream_native_decodable():
    """Each PL lane's wire bytes are a reference-format single-stream
    payload (module contract). Cross-implementation proof: wrap a lane
    in a reference frame (native header + the lane bytes + the terminal
    marker bit, reference src/lib.rs:112-143) and the independent C++
    serial decoder must reproduce that lane's strided subsequence."""
    from entropy_coders_tpu import native

    if not native.available():
        pytest.skip("native codec unavailable")
    B, k, Q = 1, 256, 9
    datas, hists = _mk(91, B, k, Q, geo)
    L = hists[0].log2
    data = datas[0]
    nt = np.asarray(hists[0].table, np.int32)
    blocks = data[None]
    We = PL.encode_w_bound(Q - 1, L)
    words, sizes = PL.encode_lanes_norm(blocks, nt[None], k=k, L=L, W=We,
                                        interpret=True)
    payload = PL.lane_merge(np.asarray(words)[0], np.asarray(sizes)[0])
    header = native.write_header(nt, L, int(np.flatnonzero(nt)[-1]) + 1)
    nbytes = (np.asarray(sizes)[0] + 7) // 8
    offs = np.concatenate([[0], np.cumsum(nbytes)])
    for i in (0, 1, k // 2, k - 1):
        sz = int(np.asarray(sizes)[0, i])
        lane = bytearray(payload[int(offs[i]): int(offs[i + 1])])
        if sz % 8:  # terminal marker bit at position sz
            lane[-1] |= 1 << (sz % 8)
        else:
            lane.append(1)
        out = native.decompress(header + bytes(lane), k=1,
                                max_out=len(data))
        assert out == data[i::k].tobytes()


def test_frame_pl_high_log_roundtrip():
    from entropy_coders_tpu import frame as F
    rng = np.random.default_rng(13)
    data = geo(rng, 2 * 4096)
    comp = F.compress(data, block_size=4096, k=256, lanes=True,
                      table_log=13, interpret=True)
    pf = F._parse_frame(comp)
    assert (pf.modes == F.MODE_FSE_PL).all()
    out = F.decompress(comp, interpret=True)
    assert out == data.tobytes()


def test_corrupt_stream_raises():
    B, k, Q = 1, 256, 16
    datas, hists = _mk(3, B, k, Q, geo)
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    words = words.copy()
    words[0, 0, :] ^= 0xFFFF  # clobber low words -> cursors misalign
    with pytest.raises(ValueError):
        # some lane must fail to drain exactly
        PL.decode_lanes(words, sizes + 3, packs, k=k, L=L, R=Q - 1,
                        interpret=True)


def test_divergent_lanes_wide_fallback():
    """Lanes with wildly different compressibility force the cursor
    spread past the windowed refill/dump's REFILL_QW window, exercising
    the full-scan fallback in both kernels (without it, this corrupts)."""
    k, Q = 128, 480
    rng = np.random.default_rng(99)
    n = k * Q
    data = np.empty(n, np.uint8)
    # even lanes: near-constant (~1 bit/sym); odd lanes: uniform (8 bits)
    per_lane = data.reshape(Q, k)
    per_lane[:, 0::2] = rng.choice(
        np.array([0, 1], np.uint8), (Q, k // 2), p=[0.95, 0.05])
    per_lane[:, 1::2] = rng.integers(0, 256, (Q, k // 2), dtype=np.uint8)
    hist = Histogram(data).normalize(10)
    L, encs, packs, words, sizes = _oracle_blocks([data], [hist], k)
    # sanity: the spread really exceeds the narrow window
    assert (sizes.max() - sizes.min()) > 32 * PL.REFILL_QW * 8
    R = Q - 1
    syms, finals = PL.decode_lanes(words, sizes, packs, k=k, L=L, R=R,
                                   interpret=True)
    got = np.concatenate([np.asarray(syms)[0].reshape(-1),
                          np.asarray(finals)[0]])
    assert got.tobytes() == data.tobytes()
    syms_in = data[: R * k].reshape(1, R, k)
    init_syms = data[R * k:].reshape(1, k)
    We = PL.encode_w_bound(R, L)
    kw, ks = PL.encode_lanes(syms_in, init_syms, encs, k=k, L=L, W=We,
                             interpret=True)
    assert (np.asarray(ks) == sizes).all()
    assert PL.lane_merge(np.asarray(kw)[0], sizes[0]) == \
        PL.lane_merge(words[0], sizes[0])


def test_lane_bits_split_merge_roundtrip():
    """Bit-packed repack (FLAG_PACKED wire): native C++ and the Python
    fallback agree and invert each other; packed payload is exactly
    ceil(sum(bits)/8) bytes."""
    from entropy_coders_tpu import native
    rng = np.random.default_rng(2)
    k = 256
    sizes = rng.integers(9, 200, k).astype(np.int64)
    W = int((int(sizes.max()) + 31) // 32) + 2
    words = rng.integers(0, 1 << 32, (W, k), dtype=np.uint64).astype(np.uint32)
    # zero dead bits above each lane's size (kernel invariant)
    lane_mask = np.zeros((W, k), np.uint64)
    for w in range(W):
        rem = np.clip(sizes - w * 32, 0, 32)
        lane_mask[w] = (np.uint64(1) << rem.astype(np.uint64)) - np.uint64(1)
    words &= lane_mask.astype(np.uint32)
    packed = PL.lane_merge_bits(words, sizes)
    assert len(packed) == (int(sizes.sum()) + 7) // 8
    back, Wb = PL.lane_split_bits(packed, sizes, k)
    assert (back[:W] == words).all() and not back[W:].any()
    # pure-Python fallback must agree with whatever produced `packed`
    import unittest.mock as mock
    with mock.patch.object(native, "available", lambda: False):
        assert PL.lane_merge_bits(words, sizes) == packed
        back2, _ = PL.lane_split_bits(packed, sizes, k)
        assert (back2[:W] == words).all()


def test_frame_bit_packed_roundtrip():
    """FLAG_PACKED frames round-trip and are strictly smaller than the
    byte-aligned wire (k dead-bit bytes recovered per block)."""
    from entropy_coders_tpu import frame as F
    rng = np.random.default_rng(17)
    data = geo(rng, 3 * 4096 + 777)
    plain = F.compress(data, block_size=4096, k=256, lanes=True,
                       interpret=True)
    packed = F.compress(data, block_size=4096, k=256, lanes=True,
                        interpret=True, bit_pack=True)
    assert F._parse_frame(packed).packed
    assert F.decompress(packed, interpret=True) == data.tobytes()
    assert len(packed) < len(plain)
    # recovers most of the <= 7 dead bits per lane: ~3.5 avg * k per block
    assert len(plain) - len(packed) > 3 * 256 * 3 // 8


def test_lane_split_merge_roundtrip():
    rng = np.random.default_rng(0)
    k = 256
    sizes = rng.integers(9, 200, k).astype(np.int64)
    payload = rng.integers(0, 255, int(((sizes + 7) // 8).sum()),
                           dtype=np.uint8)
    # zero any dead bits above each lane's size so merge == split input
    words, W = PL.lane_split(payload.tobytes(), sizes, k)
    back = PL.lane_merge(words, sizes)
    assert back == payload.tobytes()


def test_frame_pl_roundtrip():
    from entropy_coders_tpu import frame as F
    rng = np.random.default_rng(5)
    data = geo(rng, 3 * 4096 + 777)  # 3 full blocks + ragged tail
    comp = F.compress(data, block_size=4096, k=256, lanes=True,
                      interpret=True)
    out = F.decompress(comp, interpret=True)
    assert out == data.tobytes()
    # PL mode actually used on the full blocks
    pf = F._parse_frame(comp)
    assert (pf.modes[:3] == F.MODE_FSE_PL).all()


def test_frame_pl_shared_table_roundtrip():
    from entropy_coders_tpu import frame as F
    rng = np.random.default_rng(6)
    data = geo(rng, 2 * 4096)
    comp = F.compress(data, block_size=4096, k=256, lanes=True,
                      shared_table=True, interpret=True)
    out = F.decompress(comp, interpret=True)
    assert out == data.tobytes()


def test_frame_pl_sharded_roundtrip():
    """Flagship PL mode data-parallel over an 8-device mesh (shard_map +
    interpreter-mode Pallas kernels)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from entropy_coders_tpu import frame as F

    mesh = Mesh(np.array(jax.devices()[:8]), ("blocks",))
    sh = NamedSharding(mesh, PartitionSpec("blocks"))
    rng = np.random.default_rng(9)
    data = geo(rng, 10 * 4096)  # 10 blocks over 8 devices (pads to 16)
    comp = F.compress(data, block_size=4096, k=256, lanes=True,
                      interpret=True, sharding=sh)
    pf = F._parse_frame(comp)
    assert (pf.modes == F.MODE_FSE_PL).all()
    out = F.decompress(comp, interpret=True, sharding=sh)
    assert out == data.tobytes()


def test_bits_fallbacks_match_native_fuzz():
    """The numpy lane_merge_bits/lane_split_bits fallbacks (the silent
    path wherever g++ is unavailable) must agree byte-for-byte with the
    native implementations across randomized lane-size patterns — they
    are vectorized by bit-shift class, a different algorithm."""
    import unittest.mock as mock

    from entropy_coders_tpu import native
    if not native.available():
        pytest.skip("native codec unavailable")
    rng = np.random.default_rng(7)
    for trial in range(15):
        k = int(rng.choice([128, 256, 384]))
        sizes = rng.integers(10, int(rng.integers(20, 300)) + 20,
                             k).astype(np.int64)
        W = int((sizes.max() + 31) // 32) + 2
        words = rng.integers(0, 1 << 32, (W, k),
                             dtype=np.uint64).astype(np.uint32)
        nb32 = (sizes + 31) // 32
        words[np.arange(W)[:, None] >= nb32[None, :]] = 0
        top = sizes % 32
        lastm = np.where(top, (1 << np.maximum(top, 1)) - 1,
                         0xFFFFFFFF).astype(np.uint64).astype(np.uint32)
        words[np.maximum(nb32 - 1, 0), np.arange(k)] &= lastm
        ref_m = native.lane_merge_bits(words, sizes)
        ref_s = native.lane_split_bits(ref_m, sizes, k, W)
        with mock.patch.object(native, "available", lambda: False):
            assert PL.lane_merge_bits(words, sizes) == ref_m
            got_s, _ = PL.lane_split_bits(ref_m, sizes, k)
            assert np.array_equal(got_s[:W], ref_s)
            assert PL.lane_merge_bits(got_s, sizes) == ref_m


def test_bits_all_zero_sizes_fallback():
    """Degenerate all-zero lane sizes: the vectorized numpy fallbacks
    must return an empty payload / zero words like the native path
    (regression: the shift-class rewrite indexed column 0 of a 0-wide
    array and raised IndexError)."""
    import unittest.mock as mock

    from entropy_coders_tpu import native

    k, W = 128, 8
    words = np.zeros((W, k), np.uint32)
    sizes = np.zeros(k, np.int64)
    with mock.patch.object(native, "available", lambda: False):
        assert PL.lane_merge_bits(words, sizes) == b""
        back, Wb = PL.lane_split_bits(b"", sizes, k)
        assert back.shape == (Wb, k) and not back.any()
    if native.available():
        assert native.lane_merge_bits(words, sizes) == b""


def test_exact_and_masked_epoch_paths_agree():
    """The kernels compile a specialized epoch body when R % E == 0 (no
    per-round tail masking — the shipping config's case). Pin it against
    the masked-tail body: the same block coded with E=3 (R=9, exact) and
    E=2 (masked) must produce identical wire bytes, and both must decode;
    the oracle stream is the ground truth for both."""
    B, k, Q = 2, 256, 10  # R = 9: divisible by 3 (exact), not by 2
    datas, hists = _mk(23, B, k, Q, geo)
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    R = Q - 1
    assert R % 3 == 0 and R % 2 == 1 and 3 * L <= 32

    syms_in = np.stack([d[: R * k].reshape(R, k) for d in datas])
    init_syms = np.stack([d[R * k:] for d in datas])
    We = PL.encode_w_bound(R, L)
    merged = []
    for e_rounds in (3, 2):
        kw, ks = PL.encode_lanes(syms_in, init_syms, encs, k=k, L=L, W=We,
                                 interpret=True, e_rounds=e_rounds)
        assert (ks == sizes).all()
        merged.append([PL.lane_merge(kw[b], ks[b]) for b in range(B)])

        syms, finals = PL.decode_lanes(words, sizes, packs, k=k, L=L, R=R,
                                       interpret=True, e_rounds=e_rounds)
        for b, data in enumerate(datas):
            got = np.concatenate([syms[b].reshape(-1), finals[b]])
            assert got.tobytes() == data.tobytes()
    assert merged[0] == merged[1]


def test_packed_encode_back_aligned_epoch_bit_exact():
    """The packed encode entry accepts unrolls that do NOT divide R by
    reading the raw (R+1)-row array back-aligned — chunk G-1 spills one
    round into the init row, masked via ``pad_back`` (round 5; the
    E=4-at-L=8 experiment that motivated it measured SLOWER and E=3
    stays the default, but the capability is load-bearing for the
    ``e_rounds`` knob). Pin both schedules against the spec oracle."""
    import jax.numpy as jnp

    B, k, Q = 2, 256, 16  # R = 15: % 3 == 0 (exact), % 4 == 3 (pad 1)
    rng = np.random.default_rng(41)
    datas = [(geo(rng, k * Q) % 101) for _ in range(B)]  # alphabet
    hists = [Histogram(d).normalize(8) for d in datas]     # fits L=8
    L, encs, packs, words, sizes = _oracle_blocks(datas, hists, k)
    assert L == 8
    R, S = Q - 1, k // 128
    We = PL.encode_w_bound(R, L)
    small = not any(np.asarray(h.table)[128:].any() for h in hists)
    symt, stt = zip(*(PL.pack_enc_table_rows(t, tb, fs, L, small)
                      for t, tb, fs in encs))
    blocks4 = jnp.asarray(np.stack(datas).reshape(B, Q, S, 128))
    a_symt = jnp.asarray(np.stack(symt)[:, :, None, :])
    a_stt = jnp.asarray(np.stack(stt)[:, :, None, :])
    expect = [PL.lane_merge(
        np.concatenate([words[b], np.zeros((We - words.shape[1], k),
                                           np.uint32)]), sizes[b])
        for b in range(B)]
    for e_rounds in (3, 4):
        w, s = PL._encode_call_packed(blocks4, a_symt, a_stt, S=S, W=We,
                                      L=L, R=R, interpret=True,
                                      e_rounds=e_rounds)
        s = np.asarray(s).reshape(B, k)
        assert (s == sizes).all(), e_rounds
        w = np.asarray(w).reshape(B, We, k).view(np.uint32)
        for b in range(B):
            assert PL.lane_merge(w[b], s[b]) == expect[b], (e_rounds, b)
