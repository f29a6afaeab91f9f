"""Payload-level third-party interop: decode real zstd FSE bitstreams.

test_zstd_interop.py proves the *header* codec against upstream zstd
bytes; this module goes one layer deeper and proves the tANS *state
machine* itself. The reference is "specifically for replicating the
encoding/decoding scheme used by zstd" (reference src/fse.rs:2-7): its
table build is zstd's FSE_buildDTable and its backward marker-bit
bitstream is zstd's BIT_DStream. So this repo's spec core —
``NormHistogram.read`` + ``DecodeTable`` + ``BitStackReader`` — must be
able to decode the interleaved FSE sequence streams inside real zstd
frames produced by the independently-authored `zstandard` C library.

The test walks frames (tests/zstd_walk.py), rebuilds the LL/OF/ML
decode tables from each block's table descriptions *with this repo's
DecodeTable*, drives the three interleaved states through the raw
sequence bitstream *with this repo's BitStackReader* (RFC 8878
§3.1.1.3.2.1.2 interleave order), executes the resulting LZ77 sequences
against the raw literals, and asserts the reconstructed bytes equal
``zstandard.decompress``'s output exactly. A table-spread, bit-order,
state-update, or framing divergence anywhere in the spec core would
desynchronize the stream within a few sequences.

Only blocks with Raw/RLE literals are reconstructable (no Huffman
decoder here, by design — Huffman is outside the reference's scope);
the corpus is built with incompressible literals so zstd picks raw
literals + FSE sequences.
"""

import collections
import struct

import numpy as np
import pytest

zstandard = pytest.importorskip("zstandard")

from entropy_coders_tpu.spec.bitstream import BitStackReader
from entropy_coders_tpu.spec.fse import DecodeTable
from entropy_coders_tpu.spec.histogram import NormHistogram
from tests.zstd_walk import walk_blocks

# --- RFC 8878 §3.1.1.3.2.1.1 code-to-value tables (built cumulatively:
# each baseline is the previous baseline plus the previous code's range).
LL_XB = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8,
                    9, 10, 11, 12, 13, 14, 15, 16]
ML_XB = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8,
                    9, 10, 11, 12, 13, 14, 15, 16]


def _bases(first, xb, n_flat, flat0):
    base = list(range(flat0, flat0 + n_flat))
    for b in xb[n_flat:]:
        base.append(first)
        first += 1 << b
    return base


LL_BASE = _bases(16, LL_XB, 16, 0)      # codes 0-15 are the length itself
ML_BASE = _bases(35, ML_XB, 32, 3)      # codes 0-31 are length-3

# --- RFC 8878 §3.1.1.3.2.2 predefined distributions (mode 0). These are
# normative constants, verified two independent ways: the ground-truth
# stream comparison below (a wrong count desyncs within a sequence or
# two), and test_predefined_tables_match_zstds_baked_dtables, which
# extracts zstd's own precomputed default DTables from the installed
# binary and asserts our DecodeTable build reproduces them state by
# state from these counts.
LL_DEF = ([4, 3] + [2] * 11 + [1] * 3 + [2] * 9 + [3, 2] + [1] * 5
          + [-1] * 4, 6)
OF_DEF = ([1] * 6 + [2] * 3 + [1] * 15 + [-1] * 5, 5)
ML_DEF = ([1, 4, 3] + [2] * 6 + [1] * 37 + [-1] * 7, 6)
PREDEF = {"ll": LL_DEF, "of": OF_DEF, "ml": ML_DEF}


class _SeqTable:
    """One sequence-code decode table: symbol/num_bits/new_state arrays in
    this repo's DecodeTable layout, from any RFC table mode."""

    def __init__(self, which, spec, prev):
        kind = spec[0]
        if kind == "repeat":
            if prev is None:
                raise ValueError("repeat mode with no previous table")
            self.__dict__.update(prev.__dict__)
            return
        if kind == "rle":
            # single-symbol stream: log 0, one state, no transition bits
            self.table_log = 0
            self.symbol = np.array([spec[1]], np.uint8)
            self.num_bits = np.array([0], np.uint8)
            self.new_state = np.array([0], np.uint16)
            return
        if kind == "predef":
            counts, log2 = PREDEF[which]
            assert sum(max(v, 1) for v in counts) == 1 << log2
            tbl = np.zeros(256, np.int32)
            tbl[: len(counts)] = counts
            hist = NormHistogram(tbl, log2, len(counts))
        else:  # "fse": parse the NCount with the spec reader
            hist, rest = NormHistogram.read(spec[1])
            assert rest == b""
        dt = DecodeTable(hist)
        self.table_log = dt.table_log
        self.symbol = dt.symbol
        self.num_bits = dt.num_bits
        self.new_state = dt.new_state


def _decode_sequences(blk, prev_tables):
    """Decode one block's sequences section with the spec core. Returns
    (list of (ll, offset_value, ml), tables) — offset_value is the raw
    pre-repcode value."""
    tables = {w: _SeqTable(w, blk["tables"][w], prev_tables.get(w))
              for w in ("ll", "of", "ml")}
    r = BitStackReader.new(blk["bitstream"])
    assert r is not None, "sequence bitstream failed the marker framing"
    # initial states in LL, OF, ML order (RFC 8878 §3.1.1.3.2.1.2)
    st = {w: r.read(tables[w].table_log) for w in ("ll", "of", "ml")}
    assert None not in st.values()
    seqs = []
    for i in range(blk["nseq"]):
        ll_code = int(tables["ll"].symbol[st["ll"]])
        of_code = int(tables["of"].symbol[st["of"]])
        ml_code = int(tables["ml"].symbol[st["ml"]])
        # extra bits read in OF, ML, LL order
        ofv = (1 << of_code) + (r.read(of_code) if of_code else 0)
        ml = ML_BASE[ml_code] + (r.read(ML_XB[ml_code]) if ML_XB[ml_code]
                                 else 0)
        ll = LL_BASE[ll_code] + (r.read(LL_XB[ll_code]) if LL_XB[ll_code]
                                 else 0)
        seqs.append((ll, ofv, ml))
        if i + 1 < blk["nseq"]:
            # state updates in LL, ML, OF order
            for w in ("ll", "ml", "of"):
                t = tables[w]
                st[w] = (int(t.new_state[st[w]])
                         + r.read(int(t.num_bits[st[w]])))
    assert r.finish(), "sequence bitstream not fully drained"
    return seqs, tables


def _execute(seqs, literals, out, reps):
    """LZ77 execute with zstd repcode semantics (RFC 8878
    §3.1.1.3.2.1.1 Offset_Value + repeat-offset rules)."""
    lit_pos = 0
    for ll, ofv, ml in seqs:
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if ofv > 3:
            offset = ofv - 3
            reps[:] = [offset, reps[0], reps[1]]
        else:
            idx = ofv + (1 if ll == 0 else 0)
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps[:] = [reps[1], reps[0], reps[2]]
            elif idx == 3:
                offset = reps[2]
                reps[:] = [reps[2], reps[0], reps[1]]
            else:  # Offset_Value 3 with literal_length 0
                offset = reps[0] - 1
                assert offset > 0, "corrupt repcode"
                reps[:] = [offset, reps[0], reps[1]]
        start = len(out) - offset
        assert start >= 0, "offset past window start"
        for i in range(ml):  # byte-wise: overlapping copies are defined
            out.append(out[start + i])
    out += literals[lit_pos:]


def _corpus(rng, n):
    """Sequence-rich data with incompressible literals: zstd picks raw
    literals (Huffman can't win) + FSE-compressed sequence tables."""
    out = bytearray(rng.bytes(64))
    while len(out) < n:
        if rng.random() < 0.65:
            d = int(rng.integers(1, min(len(out), 1 << 15)))
            ln = int(rng.integers(4, 80))
            start = len(out) - d
            for i in range(ln):
                out.append(out[start + i])
        else:
            out += rng.bytes(int(rng.integers(6, 48)))
    return bytes(out[:n])


def _decode_frame(comp):
    """Reconstruct a whole frame with the spec core. Returns
    (bytes | None, stats) — None if any block is not reconstructable
    (Huffman literals)."""
    out = bytearray()
    reps = [1, 4, 8]
    prev_tables = {}
    stats = {"seqs": 0, "blocks": 0, "modes": collections.Counter()}
    for blk in walk_blocks(comp):
        stats["blocks"] += 1
        if blk["type"] in ("raw", "rle"):
            out += blk["data"]
            continue
        if blk["literals"] is None:
            return None, stats
        if blk["nseq"] == 0:
            out += blk["literals"]
            continue
        seqs, prev_tables = _decode_sequences(blk, prev_tables)
        stats["seqs"] += len(seqs)
        stats["modes"].update(blk["tables"][w][0] for w in ("ll", "of", "ml"))
        _execute(seqs, blk["literals"], out, reps)
    return bytes(out), stats


def test_spec_core_decodes_real_zstd_sequence_streams():
    rng = np.random.default_rng(0xF5E)
    decoded_frames = 0
    seqs = 0
    modes = collections.Counter()
    # small sizes make zstd pick predefined tables; large ones make it
    # emit FSE_Compressed tables and (at 300k) multi-block frames whose
    # later blocks use repeat mode; the fixed-period corpus (constant
    # offset/length matches) makes it pick an RLE table — all four
    # table modes get exercised
    base = rng.bytes(512)
    corpora = [_corpus(rng, size)
               for size in (400, 2_500, 12_000, 90_000, 300_000)]
    corpora.append(b"".join(base + rng.bytes(8) for _ in range(120)))
    for level in (1, 3, 10, 19):
        for data in corpora:
            comp = zstandard.ZstdCompressor(level=level).compress(data)
            got, stats = _decode_frame(comp)
            if got is None:
                continue  # Huffman literals somewhere — not our scope
            assert got == data, (
                f"level {level} size {len(data)}: reconstruction diverged at "
                f"byte {next(i for i, (a, b) in enumerate(zip(got, data)) if a != b)}"
                f" of {len(data)}")
            decoded_frames += 1
            seqs += stats["seqs"]
            modes += stats["modes"]
    # the test is vacuous unless real streams were decoded: require a
    # healthy sample covering every table mode
    assert decoded_frames >= 10, decoded_frames
    assert seqs >= 2000, seqs
    assert modes["fse"] >= 10 and modes["predef"] >= 10, dict(modes)
    assert modes["rle"] >= 1 and modes["repeat"] >= 1, dict(modes)


def test_predefined_distributions_are_wellformed():
    """The transcribed RFC 8878 default distributions sum to exactly
    2^acc_log and build clean spec DecodeTables."""
    for which, (counts, log2) in PREDEF.items():
        assert sum(max(v, 1) for v in counts) == 1 << log2, which
        tbl = np.zeros(256, np.int32)
        tbl[: len(counts)] = counts
        dt = DecodeTable(NormHistogram(tbl, log2, len(counts)))
        assert int(dt.symbol.max()) == len(counts) - 1


def _scan_baked_dtables(blob):
    """Find zstd's precomputed default DTables inside a compiled binary.

    zstd bakes ``LL/OF/ML_defaultDTable`` as arrays of ZSTD_seqSymbol
    ``{u16 nextState, u8 nbAdditionalBits, u8 nbBits, u32 baseValue}``
    prefixed by the header entry ``{1, 1, 1, accuracy_log}`` (upstream
    lib/decompress/zstd_decompress_block.c). Yields
    (log, [(nextState, nbAddBits, nbBits, baseValue), ...])."""
    for log in (5, 6):
        start = 0
        hdr = struct.pack("<HBBI", 1, 1, 1, log)
        while True:
            i = blob.find(hdr, start)
            if i < 0:
                break
            start = i + 1
            entries = []
            for j in range(1 << log):
                ns, ab, nb, bv = struct.unpack_from("<HBBI", blob,
                                                    i + 8 * (j + 1))
                if nb > log or ab > 31 or bv > (1 << 31):
                    break
                entries.append((ns, ab, nb, bv))
            if len(entries) == 1 << log:
                yield log, entries


def _classify_baked(log, entries):
    """Identify a baked DTable and recover each state's code symbol.
    Returns (which, codes) or None if it is not one of the three."""
    if log == 5:  # OF: code == nbAdditionalBits; baseValue == 2^code - 3
        codes = [ab for _, ab, _, _ in entries]
        if all(bv + 3 == 1 << ab or bv <= 1
               for _, ab, _, bv in entries):
            return "of", codes
        return None
    for which, base, xb in (("ll", LL_BASE, LL_XB), ("ml", ML_BASE, ML_XB)):
        codes = []
        for _, ab, _, bv in entries:
            c = [k for k in range(len(base)) if base[k] == bv and xb[k] == ab]
            if len(c) != 1:
                break
            codes.append(c[0])
        else:
            return which, codes
    return None


def test_predefined_tables_match_zstds_baked_dtables():
    """Deepest table-build cross-check available: extract the default
    DTables zstd itself ships (precomputed in the compiled library) and
    assert this repo's DecodeTable build reproduces every state's
    (new_state, num_bits, symbol) from the PREDEF distributions. This
    pins the spread rule, the low-prob top placement, and the
    state-transition derivation against upstream zstd's own artifacts —
    plus the RFC baseline/extra-bit code tables used to recover each
    state's code."""
    try:
        from zstandard import backend_c
    except ImportError:
        pytest.skip("no compiled zstandard backend to scan")
    blob = open(backend_c.__file__, "rb").read()
    found = {}
    for log, entries in _scan_baked_dtables(blob):
        got = _classify_baked(log, entries)
        if got is None:
            continue
        which, codes = got
        counts, log2 = PREDEF[which]
        assert log == log2, which
        tbl = np.zeros(256, np.int32)
        tbl[: len(counts)] = counts
        dt = DecodeTable(NormHistogram(tbl, log2, len(counts)))
        ours = list(zip(dt.new_state.tolist(), dt.num_bits.tolist(),
                        dt.symbol.tolist()))
        theirs = [(ns, nb, c) for (ns, _, nb, _), c in zip(entries, codes)]
        assert ours == theirs, f"{which}: table build diverges from zstd"
        found[which] = True
    if not found:
        pytest.skip("no baked default DTables found in this zstandard build")
    assert set(found) == {"ll", "of", "ml"}, set(found)
