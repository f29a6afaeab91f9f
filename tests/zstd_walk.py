"""Minimal RFC 8878 (zstd) frame walker: extract FSE table descriptions.

The reference's histogram header format IS zstd's ``FSE_writeNCount``
output (reference src/histogram.rs:342-375 documents it as such), so the
sequence-section table descriptions inside real zstd frames — produced
by the independently-implemented `zstandard` C library — are third-party
oracle bytes for ``NormHistogram.read``/``write``. This module walks a
zstd frame just far enough to slice those NCount byte ranges out; it
deliberately parses nothing it does not need (literals payloads and the
sequence bitstream are skipped by length only).

Layout references are to RFC 8878 section numbers.
"""

from __future__ import annotations

ZSTD_MAGIC = 0x0FD2FB528 & 0xFFFFFFFF

# maximum accuracy logs per table (RFC 8878 §3.1.1.3.2.1.1)
MAX_ACC_LOG = {"ll": 9, "of": 8, "ml": 9}
# maximum symbol values per table
MAX_SYM = {"ll": 35, "of": 31, "ml": 52}


def _u32le(b, off):
    return int.from_bytes(b[off : off + 4], "little")


def ncount_consumed(data: bytes) -> int:
    """Byte length of one NCount (FSE table description) starting at
    ``data[0]``, computed by an independent re-read of the format
    (RFC 8878 §4.1.1): 4-bit accuracy-log nibble, then variable-width
    ``count+1`` fields with the threshold/remaining scheme, 2-bit repeat
    flags after zeros, byte-aligned at the end. This is a *separate*
    minimal implementation used only to delimit the oracle bytes; the
    actual parse under test is NormHistogram.read."""
    bitpos = 0

    def read(n):
        nonlocal bitpos
        byte = bitpos >> 3
        val = int.from_bytes(data[byte : byte + 4], "little")
        val = (val >> (bitpos & 7)) & ((1 << n) - 1)
        bitpos += n
        return val

    def peek(n):
        byte = bitpos >> 3
        val = int.from_bytes(data[byte : byte + 4], "little")
        return (val >> (bitpos & 7)) & ((1 << n) - 1)

    acc_log = read(4) + 5
    remaining = (1 << acc_log) + 1
    threshold = 1 << acc_log
    nbits = acc_log + 1
    prev_zero = False
    n_values = 0
    while remaining > 1:
        n_values += 1
        if n_values > 300:  # > 256 symbols: the walk lost sync
            raise ValueError("NCount parse ran away (bad offset?)")
        if prev_zero:
            # zero-run flags: 0xFFFF 16-bit bursts = 24 zeros each, then
            # chained 2-bit flags (3 chains, 0-2 terminates the run)
            while peek(16) == 0xFFFF:
                read(16)
            while peek(2) == 3:
                read(2)
            read(2)
            prev_zero = False
        maxv = 2 * threshold - 1 - remaining
        v = peek(nbits - 1)
        if v < maxv:
            read(nbits - 1)  # small code
        else:
            v = read(nbits)
            if v >= threshold:
                v -= maxv
        count = v - 1  # -1 is the low-prob sentinel
        remaining -= count if count >= 0 else 1
        prev_zero = count == 0
        while 1 < remaining < threshold:
            threshold >>= 1
            nbits -= 1
    return (bitpos + 7) >> 3


def _skip_frame_header(frame: bytes):
    """Parse the frame header; return (first_block_offset, checksum_flag)."""
    off = 0
    if _u32le(frame, off) != 0xFD2FB528:
        raise ValueError("not a zstd frame")
    off += 4
    fhd = frame[off]
    off += 1
    single_segment = (fhd >> 5) & 1
    fcs_flag = fhd >> 6
    checksum = (fhd >> 2) & 1
    did_flag = fhd & 3
    if not single_segment:
        off += 1  # window descriptor
    off += (0, 1, 2, 4)[did_flag]
    off += {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[fcs_flag]
    return off, checksum


def _parse_literals(frame: bytes, off: int):
    """Parse a literals section (§3.1.1.3.1) starting at ``off``. Returns
    ``(new_off, literals | None)`` — Raw/RLE literals are materialized;
    Huffman (Compressed/Treeless) payloads are skipped by length and
    reported as None (no Huffman decoder here, by design)."""
    b0 = frame[off]
    ltype = b0 & 3
    sfmt = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE literals
        if sfmt in (0, 2):
            rsize = b0 >> 3
            off += 1
        elif sfmt == 1:
            rsize = (b0 >> 4) | (frame[off + 1] << 4)
            off += 2
        else:
            rsize = (b0 >> 4) | (frame[off + 1] << 4) | (frame[off + 2] << 12)
            off += 3
        if ltype == 0:
            return off + rsize, bytes(frame[off : off + rsize])
        return off + 1, bytes([frame[off]]) * rsize
    # Compressed / Treeless
    if sfmt in (0, 1):
        bits = _u32le(frame, off)
        rsize = (bits >> 4) & 0x3FF
        csize = (bits >> 14) & 0x3FF
        off += 3
    elif sfmt == 2:
        bits = _u32le(frame, off)
        rsize = (bits >> 4) & 0x3FFF
        csize = (bits >> 18) & 0x3FFF
        off += 4
    else:
        bits = int.from_bytes(frame[off : off + 5], "little")
        rsize = (bits >> 4) & 0x3FFFF
        csize = (bits >> 22) & 0x3FFFF
        off += 5
    return off + csize, None


def _parse_seq_section(frame: bytes, off: int, block_end: int):
    """Parse a sequences section (§3.1.1.3.2) up to (but not decoding)
    the interleaved bitstream. Returns ``(nseq, tables, bitstream)``
    where ``tables`` maps "ll"/"of"/"ml" to one of ("predef",),
    ("rle", symbol), ("fse", ncount_bytes), ("repeat",); bitstream is
    the raw backward-read FSE payload slice."""
    b0 = frame[off]
    if b0 == 0:
        return 0, None, b""
    if b0 < 128:
        nseq = b0
        off += 1
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) | frame[off + 1]
        off += 2
    else:
        nseq = frame[off + 1] | (frame[off + 2] << 8) | 0x7F00
        off += 3
    modes = frame[off]
    off += 1
    tables = {}
    for which, mode in (("ll", (modes >> 6) & 3), ("of", (modes >> 4) & 3),
                        ("ml", (modes >> 2) & 3)):
        if mode == 0:
            tables[which] = ("predef",)
        elif mode == 1:  # RLE: one symbol byte
            tables[which] = ("rle", frame[off])
            off += 1
        elif mode == 2:  # FSE_Compressed: NCount bytes
            n = ncount_consumed(frame[off:])
            tables[which] = ("fse", off, n)
            off += n
        else:
            tables[which] = ("repeat",)
    return nseq, tables, bytes(frame[off:block_end])


def walk_frame(frame: bytes):
    """Yield dicts describing every FSE_Compressed table description in
    every compressed block of a single zstd frame:
    ``{"which": "ll"|"of"|"ml", "offset": int, "nbytes": int}``.
    ``offset`` indexes into ``frame``; ``nbytes`` is the byte-aligned
    length of the NCount."""
    off, checksum = _skip_frame_header(frame)
    last = False
    while not last:
        bh = int.from_bytes(frame[off : off + 3], "little")
        off += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            off += bsize
            continue
        if btype == 1:  # RLE
            off += 1
            continue
        if btype != 2:
            raise ValueError("reserved block type")
        block_end = off + bsize
        off, _ = _parse_literals(frame, off)
        _, tables, _ = _parse_seq_section(frame, off, block_end)
        for which in ("ll", "of", "ml"):
            t = tables[which] if tables else None
            if t and t[0] == "fse":
                yield {"which": which, "offset": t[1], "nbytes": t[2]}
        off = block_end  # skip the interleaved sequence bitstream
    if checksum:
        off += 4
    if off > len(frame):
        raise ValueError("frame walk overran the buffer")


def walk_blocks(frame: bytes):
    """Yield one dict per block of a zstd frame, parsed to the point
    where the sequence bitstream (if any) can be decoded externally:

    - ``{"type": "raw", "data": bytes}``
    - ``{"type": "rle", "data": bytes}`` (already expanded)
    - ``{"type": "compressed", "literals": bytes | None, "nseq": int,
       "tables": {"ll"/"of"/"ml": ("predef",) | ("rle", sym) |
       ("fse", ncount_bytes) | ("repeat",)} | None,
       "bitstream": bytes}`` — ``literals`` is None when
       Huffman-compressed (not parsed here); ``tables``/"bitstream" are
       None/empty when the block has no sequences."""
    off, _ = _skip_frame_header(frame)
    last = False
    while not last:
        bh = int.from_bytes(frame[off : off + 3], "little")
        off += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:
            yield {"type": "raw", "data": bytes(frame[off : off + bsize])}
            off += bsize
            continue
        if btype == 1:
            yield {"type": "rle", "data": bytes([frame[off]]) * bsize}
            off += 1
            continue
        if btype != 2:
            raise ValueError("reserved block type")
        block_end = off + bsize
        off, lits = _parse_literals(frame, off)
        nseq, tables, stream = _parse_seq_section(frame, off, block_end)
        if tables:
            tables = {
                w: (("fse", bytes(frame[t[1] : t[1] + t[2]]))
                    if t[0] == "fse" else t)
                for w, t in tables.items()
            }
        yield {"type": "compressed", "literals": lits, "nseq": nseq,
               "tables": tables, "bitstream": stream}
        off = block_end
