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


def walk_frame(frame: bytes):
    """Yield dicts describing every FSE_Compressed table description in
    every compressed block of a single zstd frame:
    ``{"which": "ll"|"of"|"ml", "offset": int, "nbytes": int}``.
    ``offset`` indexes into ``frame``; ``nbytes`` is the byte-aligned
    length of the NCount."""
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
        # --- literals section (§3.1.1.3.1) — skip by length
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
            off += rsize if ltype == 0 else 1
        else:  # Compressed / Treeless
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
            off += csize
        # --- sequences section (§3.1.1.3.2)
        b0 = frame[off]
        if b0 == 0:
            off = block_end
            continue
        if b0 < 128:
            off += 1
        elif b0 < 255:
            off += 2
        else:
            off += 3
        modes = frame[off]
        off += 1
        for which, mode in (("ll", (modes >> 6) & 3), ("of", (modes >> 4) & 3),
                            ("ml", (modes >> 2) & 3)):
            if mode == 1:  # RLE: one symbol byte
                off += 1
            elif mode == 2:  # FSE_Compressed: NCount bytes
                n = ncount_consumed(frame[off:])
                yield {"which": which, "offset": off, "nbytes": n}
                off += n
            # mode 0 (predefined) and 3 (repeat): nothing in the stream
        off = block_end  # skip the interleaved sequence bitstream
    if checksum:
        off += 4
    if off > len(frame):
        raise ValueError("frame walk overran the buffer")
