"""Benchmark: aggregate FSE decode throughput of the flagship Pallas path.

Workload: synthetic geometric-ish bytes (the reference's own benchmark
distribution, prob=0.2 — reference: benches/fse_benchmark.rs:30-35),
16 MiB blocks, k=16384 per-lane tANS streams per block, per-block
tables at table_log 8 (the throughput-max point: ~+0.9% relative
compressed size vs the ratio-balanced default 10 for ~2.2x the decode
rate — PERF.md sweep), one chip (MODE_FSE_PL, ops/pl_coder.py kernels).

Headline metric: steady-state decode throughput with compressed input and
decoded output resident in device HBM — the device analog of the
reference's in-RAM criterion bench (which also excludes I/O). The full
host round trip (frame parse, lane repack, transfers over this sandbox's
~0.5 GB/s device tunnel) is verified once and reported on stderr.

Prints ONE JSON line. ``vs_baseline`` is measured against the driver's
north-star target of 10 GB/s aggregate decode on a v5e-16 pod slice,
i.e. 625 MB/s per chip (the reference publishes no numbers and Rust is
not available in this image to measure it — BASELINE.md).
"""

import json
import os
import sys
import time

# kept for subprocess probes; the authoritative enablement is the
# jax.config.update in utils/cache.py (env vars silently no-op when the
# harness preloads jax before this script runs)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from entropy_coders_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache("/tmp/jax_bench_cache")

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


def _backend_responsive(timeout_s: float = 120.0) -> bool:
    """Probe TPU-plugin client init in a SUBPROCESS with a timeout.

    A wedged device tunnel hangs ``jax.devices()`` inside an
    uninterruptible C call (observed on this sandbox: make_c_api_client
    blocked for hours) — probing in-process would hang the whole bench.
    Transient tunnel outages of a few minutes also happen, so the probe
    retries (ECT_BENCH_PROBE_RETRIES, default 3, 60 s apart) before the
    caller falls back to the CPU smoke path; worst case ~9 min, bounded
    so the driver is never hung indefinitely."""
    import subprocess
    import sys

    retries = max(int(os.environ.get("ECT_BENCH_PROBE_RETRIES", "3")), 1)
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if r.returncode == 0 and "ok" in r.stdout:
                return True
        except Exception:
            pass
        if attempt + 1 < retries:
            print("bench: device probe attempt %d/%d failed — retrying"
                  % (attempt + 1, retries), file=sys.stderr)
            time.sleep(60)
    return False


def main():
    if not _backend_responsive():
        print("bench: device backend unresponsive — forcing CPU smoke "
              "path", file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from entropy_coders_tpu import frame as F
    from entropy_coders_tpu.ops import pl_coder as PL
    from entropy_coders_tpu.spec.fse import DecodeTable, EncodeTable
    from entropy_coders_tpu.spec.histogram import NormHistogram

    on_tpu = jax.default_backend() == "tpu"
    size = 128 << 20  # 128 MiB (stable marginal timing)
    block_size = 16 << 20  # decode is block-size independent since the
    k = 16384              # windowed refill; k=16k halves the serial
                           # round count per block (39 vs 27 GB/s at 8k;
                           # 32k regresses — S=256 gather tiles)
    if not on_tpu:  # CI/smoke fallback: tiny workload, interpreter kernels
        size, block_size, k = 1 << 16, 1 << 14, 256
    # The bench ships the THROUGHPUT-MAX operating point: table_log=8
    # measures 71.4 GB/s decode / 57.4 GB/s encode vs 52/43 at L=9 and
    # 32/30 at the library's ratio-balanced default of 10, for ~+0.9%
    # relative compressed size vs L=10 on this distribution (PERF.md
    # sweep, round 4; full-frame ratio 0.459 vs 0.4563 at 9 / 0.4552 at
    # 10). The env knob re-points the whole bench at another point.
    table_log = int(os.environ.get("ECT_BENCH_TABLE_LOG", "8")) or None
    if not on_tpu:
        table_log = None  # interpreter smoke path keeps the defaults

    data = gen_sequence(0.2, size)
    t0 = time.perf_counter()
    comp = F.compress(data, block_size=block_size, k=k, lanes=True,
                      table_log=table_log, interpret=not on_tpu)
    t_comp_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    comp = F.compress(data, block_size=block_size, k=k, lanes=True,
                      table_log=table_log, interpret=not on_tpu)
    t_comp = time.perf_counter() - t0  # steady state (compiles amortized)

    t0 = time.perf_counter()
    out = F.decompress(comp, interpret=not on_tpu)
    t_e2e_cold = time.perf_counter() - t0
    assert out == data.tobytes(), "bench round trip failed"
    t0 = time.perf_counter()
    out = F.decompress(comp, interpret=not on_tpu)
    t_e2e = time.perf_counter() - t0
    assert out == data.tobytes(), "bench round trip failed"

    # --- device-resident steady-state decode (headline) ---
    pf = F._parse_frame(comp)
    B = pf.n_blocks
    R = block_size // k - 1
    sizes = np.zeros((B, k), np.int32)
    payloads, tbls, norm_tables = [], [], np.zeros((B, 256), np.int32)
    L = None
    for j in range(B):
        assert int(pf.modes[j]) == F.MODE_FSE_PL
        tbl, l2, sec = F._read_block_header(pf.section(j))
        L = l2 if L is None else L
        assert l2 == L, "bench blocks must share log2"
        sizes[j] = np.frombuffer(sec[: 2 * k], "<u2")
        payloads.append(sec[2 * k:])
        norm_tables[j] = tbl
        norm = NormHistogram(tbl, l2, F._tl(tbl))
        tbls.append(PL.decode_table_rows(DecodeTable(norm).packed, L))
    W = -(-(int(sizes.max()) // 32 + 3) // 16) * 16
    words = PL.lane_split_batch(payloads, sizes, k, W)
    S = k // 128
    a_words = jnp.asarray(
        np.ascontiguousarray(words).view(np.int32).reshape(B, W, S, 128))
    a_sizes = jnp.asarray(sizes.reshape(B, S, 128))
    a_tbl = jnp.asarray(np.stack(tbls)[:, :, None, :])  # shared-row tables

    call = lambda: PL._decode_call(a_words, a_sizes, a_tbl, S=S, W=W,
                                   L=L, R=R, interpret=not on_tpu)

    def sync(r):
        # this sandbox's device tunnel makes block_until_ready return
        # early; a tiny D2H read is the reliable completion barrier
        np.asarray(jax.tree.leaves(r)[0].ravel()[0:1])

    res = call()  # compile + warm
    assert int(jnp.sum(res[2])) == 0
    sync(res)
    # Marginal per-call time: N pipelined calls minus a 1-call baseline,
    # so the fixed ~40 ms sync RPC cost of this sandbox cancels out.
    # Repeated over several measurement batches; the reported number is
    # the MEDIAN marginal estimate (reproducible against host jitter).
    n, batches = 16, 5  # n*kernel_time must dwarf the ~40 ms sync RPC
    estimates = []
    for _ in range(batches):
        t0 = time.perf_counter()
        sync(call())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        rs = [call() for _ in range(n)]
        sync(rs[-1])
        tn = time.perf_counter() - t0
        m = (tn - t1) / (n - 1)
        if m <= t1 / 100:  # jitter swamped the baseline; amortized bound
            m = tn / n
        estimates.append(m)
    best = float(np.median(estimates))

    # --- device-resident steady-state ENCODE (secondary metric) ---
    from entropy_coders_tpu.ops.pl_coder import _encode_call, pack_enc_table_rows
    from entropy_coders_tpu.spec.fse import EncodeTable

    S = k // 128
    Rr = block_size // k - 1
    We = PL.encode_w_bound(Rr, L)
    # small-alphabet fast path when every block's symbols are < 128 —
    # the same detection frame.compress applies via encode_lanes_norm
    small = bool((norm_tables[:, 128:] == 0).all())
    symt, stt = [], []
    for j in range(B):
        norm = NormHistogram(norm_tables[j], L, F._tl(norm_tables[j]))
        et = EncodeTable(norm)
        sr, tr = pack_enc_table_rows(et.table, et.tt_bits,
                                     et.tt_find_state, L, small)
        symt.append(sr)
        stt.append(tr)
    blocks_h = data.reshape(B, block_size)
    a_syms = jnp.asarray(blocks_h[:, : Rr * k].reshape(B, Rr, S, 128))
    a_init = jnp.asarray(blocks_h[:, Rr * k:].reshape(B, S, 128))
    a_symt = jnp.asarray(np.stack(symt)[:, :, None, :])
    a_stt = jnp.asarray(np.stack(stt)[:, :, None, :])
    enc_call = lambda: _encode_call(a_syms, a_init, a_symt, a_stt,
                                    S=S, W=We, L=L, R=Rr,
                                    interpret=not on_tpu)
    sync(enc_call())
    enc_est = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(enc_call())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        rs = [enc_call() for _ in range(n)]
        sync(rs[-1])
        tn = time.perf_counter() - t0
        m = (tn - t1) / (n - 1)
        if m <= t1 / 100:
            m = tn / n
        enc_est.append(m)
    enc_best = float(np.median(enc_est))

    value = size / best
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(value),
        "unit": "bytes/s",
        "vs_baseline": round(value / PER_CHIP_TARGET, 4),
        "methodology": "device-resident steady-state kernel decode; "
                       "median marginal time over %d batches; e2e values "
                       "are steady-state (2nd call, compiles amortized)"
                       % batches,
        "value_e2e_decompress": round(size / t_e2e),
        "value_e2e_compress": round(size / t_comp),
    }))
    print(json.dumps({
        "backend": jax.default_backend(),
        "input_bytes": size,
        "compressed_bytes": len(comp),
        "ratio": round(len(comp) / size, 4),
        "compress_s_e2e": round(t_comp, 3),
        "decompress_s_e2e": round(t_e2e, 3),
        "compress_s_e2e_cold": round(t_comp_cold, 3),
        "decompress_s_e2e_cold": round(t_e2e_cold, 3),
        "decode_s_device": round(best, 6),
        "decode_s_device_samples": [round(e, 6) for e in estimates],
        "encode_s_device": round(enc_best, 6),
        "encode_throughput_device": round(size / enc_best),
        "block_size": block_size,
        "k": k,
        "table_log": L,
    }), file=sys.stderr)


if __name__ == "__main__":
    main()
