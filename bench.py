"""Benchmark: aggregate FSE decode throughput on the flagship block coder.

Workload (BASELINE.md config 3 analog): synthetic geometric-ish bytes
(the reference's own benchmark distribution, prob=0.2 — reference:
benches/fse_benchmark.rs:30-35), 128 KiB blocks, 1024-way interleave,
per-block tables, one chip.

Prints ONE JSON line. ``vs_baseline`` is measured against the driver's
north-star target of 10 GB/s aggregate decode on a v5e-16 pod slice,
i.e. 625 MB/s per chip (the reference publishes no numbers and Rust is
not available in this image to measure it — BASELINE.md).
"""

import json
import sys
import time

import numpy as np

PER_CHIP_TARGET = 10e9 / 16  # bytes/s


def gen_sequence(prob: float, size: int, seed: int = 0xF5E) -> np.ndarray:
    LUT_SIZE = 4096
    lut = np.zeros(LUT_SIZE, dtype=np.uint8)
    prob = min(max(prob, 0.005), 0.995)
    remaining, idx, s = LUT_SIZE, 0, 0
    while remaining > 0:
        n = max(int(remaining * prob), 1)
        lut[idx: idx + n] = s
        idx += n
        s = (s + 1) & 0xFF
        remaining -= n
    r = np.random.default_rng(seed)
    i = r.integers(0, 1 << 16, size=size, dtype=np.uint16)
    return lut[i & (LUT_SIZE - 1)]


def main():
    import jax

    from entropy_coders_tpu import frame as F

    size = 32 << 20  # 32 MiB
    block_size = 1 << 17
    k = 1024

    data = gen_sequence(0.2, size)
    t0 = time.perf_counter()
    comp = F.compress(data, block_size=block_size, k=k)
    t_comp = time.perf_counter() - t0

    # warmup (compile) then steady-state decode
    out = F.decompress(comp)
    assert out == data.tobytes(), "bench round trip failed"

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = F.decompress(comp)
        best = min(best, time.perf_counter() - t0)

    value = size / best
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(value),
        "unit": "bytes/s",
        "vs_baseline": round(value / PER_CHIP_TARGET, 4),
    }))
    print(json.dumps({
        "backend": jax.default_backend(),
        "input_bytes": size,
        "compressed_bytes": len(comp),
        "ratio": round(len(comp) / size, 4),
        "compress_s": round(t_comp, 3),
        "decode_s_best": round(best, 4),
        "block_size": block_size,
        "k": k,
    }), file=sys.stderr)


if __name__ == "__main__":
    main()
