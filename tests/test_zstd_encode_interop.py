"""Encode-direction third-party interop: zstd decompresses OUR frames.

test_zstd_payload.py proves the spec *decode* core against streams the
upstream zstd encoder produced. This module closes the loop in the
other direction: it assembles complete RFC 8878 zstd frames from
scratch using this repo's spec *encode* primitives —
``Histogram.normalize`` + ``NormHistogram.write`` for the FSE table
descriptions, ``EncodeTable``/``Encoder`` (``new_first_symbol`` /
``encode`` / ``finish``, reference src/fse.rs:203-250) for the three
interleaved LL/OF/ML state machines, and ``BitStackWriter`` for the
backward marker-bit payload — and requires the independently-authored
`zstandard` C library to decompress them byte-exactly.

The sequence bitstream layout is the exact LIFO mirror of the decoder's
read order (RFC 8878 §3.1.1.3.2.1.2): reads pop
``[ll_state, of_state, ml_state]`` then per sequence
``[of_extra, ml_extra, ll_extra]`` (+ ``[ll_nb, ml_nb, of_nb]``
transition bits between sequences), so the encoder pushes the reverse —
last sequence's extras first, then per earlier sequence the OF/ML/LL
transitions followed by its LL/ML/OF extras, then the three final
states (ML, OF, LL), then the sentinel bit. A one-position error
anywhere desynchronizes zstd's decoder immediately.
"""

import numpy as np
import pytest

zstandard = pytest.importorskip("zstandard")

from entropy_coders_tpu.spec.bitstream import BitStackWriter
from entropy_coders_tpu.spec.fse import Encoder, EncodeTable
from entropy_coders_tpu.spec.histogram import Histogram
from tests.test_zstd_payload import (LL_BASE, LL_XB, ML_BASE, ML_XB,
                                     _decode_frame, _execute)

MAX_ACC = {"ll": 9, "of": 8, "ml": 9}  # RFC 8878 §3.1.1.3.2.1.1


def _code(v, base, xb):
    """Inverse of the RFC code-to-value tables: largest code whose
    [base, base + 2^extra) range contains v."""
    c = int(np.searchsorted(base, v, side="right")) - 1
    assert base[c] <= v < base[c] + (1 << xb[c]), (v, c)
    return c


def _gen(rng, n_seq, with_repcodes):
    """Random but always-valid literals + sequences; the data they
    regenerate is materialized with the same _execute model zstd
    implements, so the zstandard comparison is self-grounding."""
    seqs = []
    reps = [1, 4, 8]
    cur = 0  # regenerated length so far
    lit_total = 0
    for i in range(n_seq):
        ll = int(rng.integers(0, 24)) if cur else int(rng.integers(4, 24))
        ml = int(rng.integers(3, 40))
        pos = cur + ll  # match starts after this sequence's literals
        if with_repcodes and cur > 16 and rng.random() < 0.3:
            ofv = int(rng.integers(1, 4))
            # resolve the repcode exactly as _execute will, to keep the
            # generated stream valid (offset in (0, pos])
            idx = ofv + (1 if ll == 0 else 0)
            off = (reps[0] if idx == 1 else reps[1] if idx == 2
                   else reps[2] if idx == 3 else reps[0] - 1)
            if not 0 < off <= pos:
                ofv = None
            else:
                if idx == 2:
                    reps[:] = [reps[1], reps[0], reps[2]]
                elif idx == 3:
                    reps[:] = [reps[2], reps[0], reps[1]]
                elif idx == 4:
                    reps[:] = [off, reps[0], reps[1]]
        else:
            ofv = None
        if ofv is None:
            off = int(rng.integers(1, pos + 1))
            ofv = off + 3
            reps[:] = [off, reps[0], reps[1]]
        seqs.append((ll, ofv, ml))
        cur = pos + ml
        lit_total += ll
    tail = int(rng.integers(0, 16))
    literals = bytes(rng.integers(0, 256, lit_total + tail, dtype=np.uint16)
                     .astype(np.uint8))
    out = bytearray()
    _execute(seqs, literals, out, [1, 4, 8])
    return literals, seqs, bytes(out)


def _table_spec(codes, which):
    """(mode, header_bytes, EncodeTable | None) for one code stream:
    RLE when a single distinct code, FSE_Compressed otherwise, with the
    accuracy log capped at zstd's per-table maximum."""
    if len(set(codes)) == 1:
        return 1, bytes([codes[0]]), None
    h = Histogram(np.asarray(codes, np.uint8))
    norm = h.normalize(min(h.optimal_log2(), MAX_ACC[which]))
    hdr = bytearray()
    norm.write(hdr)
    return 2, bytes(hdr), EncodeTable(norm)


def _assemble_frame(literals, seqs):
    """Build a complete single-block zstd frame with the spec encoder."""
    n = len(seqs)
    llv = [s[0] for s in seqs]
    ofv = [s[1] for s in seqs]
    mlv = [s[2] for s in seqs]
    llc = [_code(v, LL_BASE, LL_XB) for v in llv]
    mlc = [_code(v, ML_BASE, ML_XB) for v in mlv]
    ofc = [v.bit_length() - 1 for v in ofv]

    specs = {"ll": _table_spec(llc, "ll"), "of": _table_spec(ofc, "of"),
             "ml": _table_spec(mlc, "ml")}
    enc = {w: (Encoder.new_first_symbol(specs[w][2], c[-1])
               if specs[w][2] is not None else None)
           for w, c in (("ll", llc), ("of", ofc), ("ml", mlc))}

    payload = bytearray()
    w = BitStackWriter(payload)
    # last sequence: extras only (its codes seeded the initial states)
    w.write_bits(llv[n - 1] - LL_BASE[llc[n - 1]], LL_XB[llc[n - 1]])
    w.write_bits(mlv[n - 1] - ML_BASE[mlc[n - 1]], ML_XB[mlc[n - 1]])
    w.write_bits(ofv[n - 1] - (1 << ofc[n - 1]), ofc[n - 1])
    for i in range(n - 2, -1, -1):
        if enc["of"]:
            enc["of"].encode(w, ofc[i])
        if enc["ml"]:
            enc["ml"].encode(w, mlc[i])
        if enc["ll"]:
            enc["ll"].encode(w, llc[i])
        w.write_bits(llv[i] - LL_BASE[llc[i]], LL_XB[llc[i]])
        w.write_bits(mlv[i] - ML_BASE[mlc[i]], ML_XB[mlc[i]])
        w.write_bits(ofv[i] - (1 << ofc[i]), ofc[i])
    for which in ("ml", "of", "ll"):  # decoder reads LL, OF, ML first
        if enc[which]:
            enc[which].finish(w)
    w.write_bits(1, 1)  # terminal sentinel bit
    w.finish()

    # --- sequences section header
    if n < 128:
        nseq = bytes([n])
    elif n < 0x7F00:
        nseq = bytes([(n >> 8) + 0x80, n & 0xFF])
    else:
        nseq = bytes([0xFF, (n - 0x7F00) & 0xFF, (n - 0x7F00) >> 8])
    modes = bytes([(specs["ll"][0] << 6) | (specs["of"][0] << 4)
                   | (specs["ml"][0] << 2)])

    # --- literals section: Raw, 3-byte (20-bit) size format
    rs = len(literals)
    lit_hdr = bytes([0 | (3 << 2) | ((rs & 0xF) << 4),
                     (rs >> 4) & 0xFF, rs >> 12])

    body = (lit_hdr + literals + nseq + modes
            + specs["ll"][1] + specs["of"][1] + specs["ml"][1] + payload)

    regen = sum(llv) + sum(mlv) + (len(literals) - sum(llv))
    frame = bytearray()
    frame += (0xFD2FB528).to_bytes(4, "little")
    frame += bytes([(3 << 6) | (1 << 5)])  # 8-byte FCS, single-segment
    frame += regen.to_bytes(8, "little")
    frame += ((len(body) << 3) | (2 << 1) | 1).to_bytes(3, "little")
    frame += body
    return bytes(frame)


@pytest.mark.parametrize("seed,n_seq,reps", [
    (1, 5, False), (2, 60, False), (3, 300, True),
    (4, 1500, True), (5, 40, True),
])
def test_zstd_decompresses_our_frames(seed, n_seq, reps):
    rng = np.random.default_rng(seed)
    literals, seqs, data = _gen(rng, n_seq, reps)
    frame = _assemble_frame(literals, seqs)
    got = zstandard.ZstdDecompressor().decompress(frame)
    assert got == data, (
        f"zstd's decode of our frame diverged at byte "
        f"{next((i for i, (a, b) in enumerate(zip(got, data)) if a != b), min(len(got), len(data)))}"
        f" (got {len(got)} of {len(data)} bytes)")
    # and our own payload decoder agrees on our own frame (closes the
    # local encode->decode loop through the same RFC surface)
    ours, stats = _decode_frame(frame)
    assert ours == data
    assert stats["seqs"] == len(seqs)


def test_zstd_decompresses_our_rle_table_frame():
    """Constant sequences force all three tables into RLE mode (single
    distinct code, no FSE table at all) — the other wire shape zstd's
    sequence decoder accepts."""
    rng = np.random.default_rng(9)
    seqs = [(8, 8, 5)] * 30  # ll=8, offset 5 (ofv 8), ml=5, all constant
    literals = bytes(rng.integers(0, 256, 8 * 30 + 6, dtype=np.uint16)
                     .astype(np.uint8))
    out = bytearray()
    _execute(seqs, literals, out, [1, 4, 8])
    frame = _assemble_frame(literals, seqs)
    llc = [_code(s[0], LL_BASE, LL_XB) for s in seqs]
    ofc = [s[1].bit_length() - 1 for s in seqs]
    mlc = [_code(s[2], ML_BASE, ML_XB) for s in seqs]
    assert {_table_spec(llc, "ll")[0], _table_spec(ofc, "of")[0],
            _table_spec(mlc, "ml")[0]} == {1}  # all RLE
    assert zstandard.ZstdDecompressor().decompress(frame) == bytes(out)


def test_our_frames_exercise_fse_tables():
    """The random generator must produce FSE_Compressed tables (the RLE
    shape has its own dedicated test above)."""
    rng = np.random.default_rng(4)
    literals, seqs, _ = _gen(rng, 1500, True)
    llc = [_code(s[0], LL_BASE, LL_XB) for s in seqs]
    ofc = [s[1].bit_length() - 1 for s in seqs]
    mlc = [_code(s[2], ML_BASE, ML_XB) for s in seqs]
    assert {_table_spec(llc, "ll")[0], _table_spec(ofc, "of")[0],
            _table_spec(mlc, "ml")[0]} == {2}
