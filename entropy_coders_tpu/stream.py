"""Bounded-memory file streaming over the container format.

``frame.compress``/``decompress`` materialize the whole buffer; these
wrappers process ``chunk_blocks`` blocks at a time, so host memory stays
O(chunk) regardless of file size (production path for corpora larger
than RAM). The trick mirrors ``parallel.multihost``'s ordered assembly:
every chunk is compressed as a self-contained sub-frame whose block
table entries and payload bytes are streamed into their final places —
the frame header and tables are sized purely by ``n_blocks``, which is
known from the file size up front, so the table area is reserved and
patched once at the end. Output lands in a same-directory temp file
renamed over the destination only on success (a failure never destroys
a pre-existing archive).
"""

from __future__ import annotations

import mmap
import os
import secrets

import numpy as np

from . import frame as F

__all__ = ["compress_file", "decompress_file"]


def _mkstemp_for(dst_path):
    """Open a unique same-directory temp file for atomic replace of
    ``dst_path``. Concurrent invocations targeting the same destination
    must never share (or unlink) each other's in-progress file, so the
    name is randomized. The file is created directly at mode 0o666 with
    O_EXCL — the kernel applies the caller's CURRENT umask at creation
    exactly like a normal ``open``, so the renamed result matches a
    normally-created file with no umask probe/restore window (``os.umask``
    can only be read by setting it, which is thread-unsafe). Returns
    ``(open binary file object, tmp_path)`` — the fd is wrapped
    immediately so no exception window can leak it."""
    dst = os.fspath(dst_path)
    d = os.path.dirname(dst) or "."
    prefix = os.path.basename(dst) + ".tmp."
    for _ in range(100):
        tmp_path = os.path.join(d, prefix + secrets.token_hex(8))
        try:
            fd = os.open(tmp_path,
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o666)
        except FileExistsError:
            continue
        try:
            return os.fdopen(fd, "wb"), tmp_path
        except BaseException:
            os.close(fd)
            os.unlink(tmp_path)
            raise
    raise FileExistsError(f"could not create a unique temp file for {dst}")


def compress_file(src_path, dst_path, *, block_size: int = F.DEFAULT_BLOCK_SIZE,
                  k: int = F.DEFAULT_K, chunk_blocks: int = 64,
                  checksum: bool = False, bit_pack: bool = False,
                  table_log: int | str | tuple | None = None,
                  lanes: bool | None = None,
                  interpret: bool = False) -> int:
    """Stream-compress ``src_path`` into ``dst_path``; returns the
    compressed byte count. Host memory is O(chunk_blocks * block_size).
    ``shared_table`` is not supported (it needs a whole-file histogram
    before any block can encode; per-block tables are the streaming
    default)."""
    if chunk_blocks < 1:
        raise ValueError("chunk_blocks must be >= 1")
    if block_size < 16:
        raise ValueError("block_size must be >= 16")
    total_len = os.path.getsize(src_path)
    n_blocks = -(-total_len // block_size) if total_len else 0
    entries = np.zeros(n_blocks, np.uint32)
    crcs = np.zeros(n_blocks, np.uint32) if checksum else None
    hdr = F._frame_header(total_len, k, block_size, n_blocks, False,
                          checksum, bit_pack)
    table_off = len(hdr)
    table_len = 4 * n_blocks * (2 if checksum else 1)
    fout, tmp_path = _mkstemp_for(dst_path)
    done = 0
    try:
        with open(src_path, "rb") as fin, fout:
            fout.write(hdr)
            fout.write(b"\0" * table_len)  # reserved; patched at the end
            while True:
                chunk = fin.read(chunk_blocks * block_size)
                if not chunk:
                    break
                sub = F.compress(np.frombuffer(chunk, np.uint8),
                                 block_size=block_size, k=k, lanes=lanes,
                                 table_log=table_log, checksum=checksum,
                                 bit_pack=bit_pack, interpret=interpret)
                pf = F._parse_frame(sub)
                ent, sub_crcs, payload = F._subframe_parts(pf)
                nb = pf.n_blocks
                entries[done: done + nb] = ent
                if checksum:
                    crcs[done: done + nb] = sub_crcs
                fout.write(payload)
                done += nb
            if done != n_blocks:
                raise ValueError("input changed size during compression")
            end = fout.tell()
            fout.seek(table_off)
            fout.write(entries.astype("<u4").tobytes())
            if checksum:
                fout.write(crcs.astype("<u4").tobytes())
        os.replace(tmp_path, dst_path)
    except BaseException:
        try:
            fout.close()
        except OSError:
            pass
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        raise
    return end


def decompress_file(src_path, dst_path, *, chunk_blocks: int = 64,
                    interpret: bool = False) -> int:
    """Stream-decompress ``src_path`` into ``dst_path``; returns the raw
    byte count. The frame is memory-mapped (no full-frame copy), parsed
    ONCE, and decoded ``chunk_blocks`` blocks at a time via the
    container's random-access property. Output is written atomically
    (same-directory temp + rename)."""
    fout, tmp_path = _mkstemp_for(dst_path)
    try:
        with open(src_path, "rb") as fin:
            try:
                mm = mmap.mmap(fin.fileno(), 0, access=mmap.ACCESS_READ)
            except ValueError:  # empty file
                mm = b""
            pf = F._parse_frame(mm)
            with fout:
                # one reusable chunk buffer: every chunk is block-aligned,
                # so _decompress_parsed's out= path decodes straight into
                # it (no per-chunk bytes allocation + copy)
                buf = bytearray(min(chunk_blocks * max(pf.block_size, 1),
                                    pf.total_len))
                for b_lo in range(0, pf.n_blocks, chunk_blocks):
                    start = b_lo * pf.block_size
                    length = min((b_lo + chunk_blocks) * pf.block_size,
                                 pf.total_len) - start
                    n = F._decompress_parsed(
                        pf, start=start, length=length,
                        interpret=interpret, out=buf)
                    fout.write(memoryview(buf)[:n])
                total = fout.tell()
        if total != pf.total_len:
            raise ValueError("decoded length mismatch")
        os.replace(tmp_path, dst_path)
    except BaseException:
        try:
            fout.close()
        except OSError:
            pass
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        raise
    return total
