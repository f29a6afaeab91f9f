"""Bounded-memory file streaming (entropy_coders_tpu.stream)."""

import numpy as np
import pytest

from entropy_coders_tpu import frame as F
from entropy_coders_tpu.stream import compress_file, decompress_file
from tests.conftest import gen_sequence


@pytest.mark.parametrize("n,chunk", [(10 * 2048 + 321, 3), (4 * 2048, 4),
                                     (2048, 1)])
def test_stream_matches_monolithic(tmp_path, n, chunk):
    """The streamed file is byte-identical to frame.compress of the whole
    buffer (blocks encode independently), and round-trips."""
    data = gen_sequence(0.2, n, seed=n)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.fset"
    back = tmp_path / "back.bin"
    src.write_bytes(data)
    n_out = compress_file(src, dst, block_size=2048, k=128,
                          chunk_blocks=chunk, checksum=True,
                          interpret=True)
    mono = F.compress(data, block_size=2048, k=128, checksum=True,
                      interpret=True)
    assert dst.read_bytes() == mono
    assert n_out == len(mono)
    assert decompress_file(dst, back, chunk_blocks=2,
                           interpret=True) == n
    assert back.read_bytes() == data.tobytes()


def test_stream_bit_packed(tmp_path):
    data = gen_sequence(0.3, 6 * 2048, seed=7)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.fset"
    back = tmp_path / "back.bin"
    src.write_bytes(data)
    compress_file(src, dst, block_size=2048, k=128, chunk_blocks=2,
                  bit_pack=True, interpret=True)
    assert F._parse_frame(dst.read_bytes()).packed
    decompress_file(dst, back, interpret=True)
    assert back.read_bytes() == data.tobytes()


def test_stream_empty(tmp_path):
    src = tmp_path / "e.bin"
    dst = tmp_path / "e.fset"
    back = tmp_path / "e.out"
    src.write_bytes(b"")
    compress_file(src, dst, interpret=True)
    assert decompress_file(dst, back, interpret=True) == 0
    assert back.read_bytes() == b""


def test_failed_streaming_leaks_nothing(tmp_path):
    """A failing compress/decompress must leave no temp files behind and
    must not leak the temp file descriptor (the fd is wrapped in a file
    object the moment it is created)."""
    import os

    def live_fds():
        return len(os.listdir("/proc/self/fd"))

    dst = tmp_path / "out.ect"
    base = live_fds()
    # missing source file
    for _ in range(5):
        with pytest.raises(FileNotFoundError):
            compress_file(tmp_path / "missing", dst, interpret=True)
        with pytest.raises(FileNotFoundError):
            decompress_file(tmp_path / "missing", dst, interpret=True)
    # corrupt frame: parse fails after the temp file exists
    bad = tmp_path / "bad.ect"
    bad.write_bytes(b"XXXXnot a frame")
    for _ in range(5):
        with pytest.raises(ValueError):
            decompress_file(bad, dst, interpret=True)
    assert live_fds() <= base
    assert [f for f in os.listdir(tmp_path)
            if ".tmp." in f] == [], "temp files left behind"


def test_stream_policy_table_logs(tmp_path):
    """The per-block "auto"/"fast" log policies flow through the
    bounded-memory file path and the result decodes back exactly."""
    data = gen_sequence(0.2, 3 * 16384 + 511).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    for tl in ("auto", "fast"):
        out = tmp_path / f"{tl}.fset"
        back = tmp_path / f"{tl}.bin"
        compress_file(src, out, block_size=16384, k=64, table_log=tl)
        decompress_file(out, back)
        assert back.read_bytes() == data
