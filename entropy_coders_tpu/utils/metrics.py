"""Frame-level statistics for observability.

The reference exposes only return-value bit/byte counts
(src/histogram.rs:376, src/lib.rs:142,210); this module adds a structured
per-frame breakdown of the container format (FORMAT.md).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class FrameStats:
    total_len: int
    compressed_len: int
    n_blocks: int
    block_size: int
    k: int
    shared_table: bool
    mode_counts: dict
    header_bytes: int
    payload_bytes: int
    lane_size_table_bytes: int
    # per-block table logs of the FSE-coded blocks, as {log: count} —
    # shows what the "auto"/"fast" per-block policies actually chose
    table_log_counts: dict = field(default_factory=dict)

    @property
    def ratio(self) -> float:
        return self.compressed_len / max(self.total_len, 1)

    @property
    def overhead(self) -> float:
        """Container+header bytes as a fraction of the compressed size."""
        extra = self.compressed_len - self.payload_bytes
        return extra / max(self.compressed_len, 1)


def frame_stats(frame: bytes) -> FrameStats:
    """Parse a container frame's structure without decoding payloads."""
    from .. import frame as F
    from ..spec.histogram import NormHistogram

    pf = F._parse_frame(frame)
    names = {F.MODE_FSE: "fse", F.MODE_RAW: "raw", F.MODE_RLE: "rle",
             F.MODE_FSE_PL: "fse_pl"}
    mode_counts: dict = {}
    log_counts: dict = {}
    header_bytes = len(pf.shared_hdr)
    payload_bytes = 0
    lane_bytes = 0
    shared_log = (NormHistogram.read(pf.shared_hdr)[0].log2
                  if pf.shared and pf.shared_hdr else None)
    for i in range(pf.n_blocks):
        mode = names.get(int(pf.modes[i]), "?")
        mode_counts[mode] = mode_counts.get(mode, 0) + 1
        sec = pf.section(i)
        if pf.modes[i] in (F.MODE_FSE, F.MODE_FSE_PL):
            if pf.shared:
                if shared_log is not None:
                    log_counts[shared_log] = log_counts.get(shared_log, 0) + 1
            else:
                hist, rest = NormHistogram.read(sec)
                log_counts[hist.log2] = log_counts.get(hist.log2, 0) + 1
                header_bytes += len(sec) - len(rest)
                sec = rest
        if pf.modes[i] == F.MODE_FSE_PL:
            if pf.packed:
                import struct
                (cs_len,) = struct.unpack_from("<H", sec)
                n = 2 + (cs_len if cs_len else 2 * pf.k)
            else:
                n = 2 * pf.k
            lane_bytes += n
            sec = sec[n:]
        payload_bytes += len(sec)
    return FrameStats(
        total_len=pf.total_len,
        compressed_len=len(frame),
        n_blocks=pf.n_blocks,
        block_size=pf.block_size,
        k=pf.k,
        shared_table=pf.shared,
        mode_counts=mode_counts,
        header_bytes=header_bytes,
        payload_bytes=payload_bytes,
        lane_size_table_bytes=lane_bytes,
        table_log_counts=dict(sorted(log_counts.items())),
    )
