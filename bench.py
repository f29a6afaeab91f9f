"""Benchmark: aggregate FSE decode throughput of the flagship Pallas path.

Workload: synthetic geometric-ish bytes (the reference's own benchmark
distribution, prob=0.2 — reference: benches/fse_benchmark.rs:30-35),
16 MiB blocks, one chip (MODE_FSE_PL, ops/pl_coder.py kernels).

TWO operating points are measured and emitted in ONE JSON line:

* the THROUGHPUT headline — k=16384 per-lane streams, per-block tables
  at table_log 8 (the throughput-max point, PERF.md sweep);
* the PARITY record — k=8192, table_log 11, bit-packed lanes
  (FLAG_PACKED): the ratio-optimal container config, whose compressed
  size is <= the reference's monolithic single-table frame on this
  corpus (0.4530, BASELINE.md) while device decode stays >an order of
  magnitude over the 625 MB/s per-chip driver target. This is the
  driver's acceptance bar measured on BOTH axes at once (VERDICT r4
  item 1).

Headline metric: steady-state decode throughput with compressed input and
decoded output resident in device HBM — the device analog of the
reference's in-RAM criterion bench (which also excludes I/O). The full
host round trip (frame parse, lane repack, transfers over this sandbox's
~0.5 GB/s device tunnel) is verified for both points and reported on
stderr.

``vs_baseline`` is measured against the driver's north-star target of
10 GB/s aggregate decode on a v5e-16 pod slice, i.e. 625 MB/s per chip
(the reference publishes no numbers and Rust is not available in this
image to measure it — BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

from entropy_coders_tpu.utils.cache import enable_compilation_cache

# the library-default cache dir (utils/cache.py), NOT a bench-private
# one: `python -m entropy_coders_tpu warmup` and real library use must
# share the bench's compiled kernels (a private dir made every bench
# process recompile shapes warmup had already paid for — round 5)
enable_compilation_cache()

PER_CHIP_TARGET = 10e9 / 16  # bytes/s

# the reference's monolithic single-table frame (k=2, optimal_log2=11,
# /root/reference/src/lib.rs:112-183) measures 0.4530 on this corpus
# (BASELINE.md); the parity point must land at or under it
REFERENCE_RATIO = 0.4530


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


def _sync(r):
    """Completion barrier: this sandbox's device tunnel makes
    block_until_ready return early; a tiny D2H read is reliable."""
    import jax

    np.asarray(jax.tree.leaves(r)[0].ravel()[0:1])


def _marginal(call, n=16, batches=5):
    """MEDIAN marginal per-call wall time over pipelined batches: N
    pipelined calls minus a 1-call baseline cancels the fixed ~40 ms
    sync RPC of this sandbox's tunnel (PERF.md measurement pitfalls)."""
    _sync(call())  # compile + warm
    estimates = []
    for _ in range(batches):
        t0 = time.perf_counter()
        _sync(call())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        rs = [call() for _ in range(n)]
        _sync(rs[-1])
        tn = time.perf_counter() - t0
        m = (tn - t1) / (n - 1)
        if m <= t1 / 100:  # jitter swamped the baseline; amortized bound
            m = tn / n
        estimates.append(m)
    return float(np.median(estimates)), estimates


def _parse_pl_frame(comp, block_size, k):
    """Pull per-block (sizes, payload, norm table) + shared L out of an
    all-MODE_FSE_PL frame (mirrors frame._decode_group_pl's parsing)."""
    from entropy_coders_tpu import frame as F

    pf = F._parse_frame(comp)
    B = pf.n_blocks
    sizes = np.zeros((B, k), np.int32)
    payloads, norm_tables = [], np.zeros((B, 256), np.int32)
    L = None
    for j in range(B):
        assert int(pf.modes[j]) == F.MODE_FSE_PL
        tbl, l2, sec = F._read_block_header(pf.section(j))
        L = l2 if L is None else L
        assert l2 == L, "bench blocks must share log2"
        if pf.packed:
            sz, sec = F._unpack_size_table(sec, k)
            sizes[j] = sz
        else:
            sizes[j] = np.frombuffer(sec[: 2 * k], "<u2")
            sec = sec[2 * k:]
        payloads.append(sec)
        norm_tables[j] = tbl
    return sizes, payloads, norm_tables, L, bool(pf.packed)


def _measure_decode(comp, size, block_size, k, on_tpu, batches=5):
    """Device-resident steady-state kernel decode rate of ``comp``."""
    import jax.numpy as jnp

    from entropy_coders_tpu.ops import pl_coder as PL
    from entropy_coders_tpu.spec.fse import DecodeTable
    from entropy_coders_tpu.spec.histogram import NormHistogram
    from entropy_coders_tpu import frame as F

    sizes, payloads, norm_tables, L, packed = _parse_pl_frame(
        comp, block_size, k)
    R = block_size // k - 1
    small = PL.upack_ok(norm_tables, L)
    tbls = [PL.decode_table_rows(
        DecodeTable(NormHistogram(norm_tables[j], L,
                                  F._tl(norm_tables[j]))).packed, L,
        small)
            for j in range(len(payloads))]
    B = len(payloads)
    W = -(-(int(sizes.max()) // 32 + 3) // 16) * 16
    words = PL.lane_split_batch(payloads, sizes, k, W, pack_bits=packed)
    S = k // 128
    a_words = jnp.asarray(
        np.ascontiguousarray(words).view(np.int32).reshape(B, W, S, 128))
    a_sizes = jnp.asarray(sizes.reshape(B, S, 128))
    a_tbl = jnp.asarray(np.stack(tbls)[:, :, None, :])  # shared-row tables

    call = lambda: PL._decode_call(a_words, a_sizes, a_tbl, S=S, W=W,
                                   L=L, R=R, interpret=not on_tpu)
    res = call()
    assert int(jnp.sum(res[2])) == 0
    best, estimates = _marginal(call, batches=batches)
    return size / best, best, estimates


def _measure_encode(data, comp, size, block_size, k, on_tpu, batches=3):
    """Device-resident steady-state kernel encode rate at ``comp``'s
    tables/config (small-alphabet detection as frame.compress applies)."""
    import jax.numpy as jnp

    from entropy_coders_tpu.ops import pl_coder as PL
    from entropy_coders_tpu.ops.pl_coder import (_encode_call,
                                                 pack_enc_table_rows)
    from entropy_coders_tpu.spec.fse import EncodeTable
    from entropy_coders_tpu.spec.histogram import NormHistogram
    from entropy_coders_tpu import frame as F

    _, _, norm_tables, L, _ = _parse_pl_frame(comp, block_size, k)
    B = norm_tables.shape[0]
    S = k // 128
    Rr = block_size // k - 1
    We = PL.encode_w_bound(Rr, L)
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
    call = lambda: _encode_call(a_syms, a_init, a_symt, a_stt,
                                S=S, W=We, L=L, R=Rr,
                                interpret=not on_tpu)
    best, estimates = _marginal(call, batches=batches)
    return size / best, best, estimates


def _roundtrip(data, size, block_size, k, table_log, bit_pack, on_tpu):
    """compress (cold + steady) -> decompress (cold + steady), round
    trips asserted. Returns (comp, timings dict)."""
    from entropy_coders_tpu import frame as F

    kw = dict(block_size=block_size, k=k, lanes=True, table_log=table_log,
              bit_pack=bit_pack, interpret=not on_tpu)
    t0 = time.perf_counter()
    comp = F.compress(data, **kw)
    t_comp_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    comp = F.compress(data, **kw)
    t_comp = time.perf_counter() - t0  # steady state (compiles amortized)
    t0 = time.perf_counter()
    out = F.decompress(comp, interpret=not on_tpu)
    t_e2e_cold = time.perf_counter() - t0
    assert out == data.tobytes(), "bench round trip failed"
    t0 = time.perf_counter()
    out = F.decompress(comp, interpret=not on_tpu)
    t_e2e = time.perf_counter() - t0
    assert out == data.tobytes(), "bench round trip failed"
    return comp, {
        "compress_s_e2e": round(t_comp, 3),
        "decompress_s_e2e": round(t_e2e, 3),
        "compress_s_e2e_cold": round(t_comp_cold, 3),
        "decompress_s_e2e_cold": round(t_e2e_cold, 3),
    }


def main():
    if not _backend_responsive():
        print("bench: device backend unresponsive — forcing CPU smoke "
              "path", file=sys.stderr)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    on_tpu = jax.default_backend() == "tpu"
    size = 128 << 20  # 128 MiB (stable marginal timing)
    block_size = 16 << 20  # decode is block-size independent since the
    k = 16384              # windowed refill; k=16k halves the serial
                           # round count per block (39 vs 27 GB/s at 8k;
                           # 32k regresses — S=256 gather tiles)
    # parity point: ratio-optimal container config — k=8192 halves the
    # per-lane header/final-state overhead, L=11 is the reference's
    # optimal_log2 on this corpus, FLAG_PACKED recovers the dead bits
    pk, pL = 8192, 11
    if not on_tpu:  # CI/smoke fallback: tiny workload, interpreter kernels
        size, block_size, k = 1 << 16, 1 << 14, 256
        pk, pL = 256, None
    # The bench ships the THROUGHPUT-MAX operating point: table_log=8
    # measures ~71 GB/s decode / ~57 GB/s encode vs 52/43 at L=9 and
    # 32/30 at the ratio-balanced 10, for ~+0.9% relative compressed
    # size vs L=10 on this distribution (PERF.md sweep). The env knob
    # re-points the headline at another L.
    table_log = int(os.environ.get("ECT_BENCH_TABLE_LOG", "8")) or None
    if not on_tpu:
        table_log = None  # interpreter smoke path keeps the defaults

    data = gen_sequence(0.2, size)

    # --- throughput headline point ---
    comp, times = _roundtrip(data, size, block_size, k, table_log,
                             False, on_tpu)
    dec_rate, dec_s, dec_est = _measure_decode(comp, size, block_size, k,
                                               on_tpu)
    enc_rate, enc_s, enc_est = _measure_encode(data, comp, size,
                                               block_size, k, on_tpu)

    # --- parity point (ratio <= the reference frame's, VERDICT r4 #1) ---
    pcomp, ptimes = _roundtrip(data, size, block_size, pk, pL, True,
                               on_tpu)
    p_ratio = len(pcomp) / size
    p_dec_rate, p_dec_s, p_dec_est = _measure_decode(
        pcomp, size, block_size, pk, on_tpu, batches=3)
    p_enc_rate, p_enc_s, p_enc_est = _measure_encode(
        data, pcomp, size, block_size, pk, on_tpu, batches=3)
    if on_tpu:
        assert p_ratio <= REFERENCE_RATIO, (
            f"parity point regressed: {p_ratio:.4f} > {REFERENCE_RATIO}")

    value = dec_rate
    print(json.dumps({
        "metric": "decode_throughput",
        "value": round(value),
        "unit": "bytes/s",
        "vs_baseline": round(value / PER_CHIP_TARGET, 4),
        "methodology": "device-resident steady-state kernel decode; "
                       "median marginal time over 5 batches; e2e values "
                       "are steady-state (2nd call, compiles amortized); "
                       "parity_* fields are the ratio-optimal config "
                       "(k=%d, L=%s, bit-packed) with the round trip "
                       "asserted — ratio <= the reference frame's %.4f "
                       "with device decode still >10 GB/s aggregate"
                       % (pk, pL, REFERENCE_RATIO),
        "value_e2e_decompress": round(size / times["decompress_s_e2e"]),
        "value_e2e_compress": round(size / times["compress_s_e2e"]),
        "ratio": round(len(comp) / size, 4),
        "parity_ratio": round(p_ratio, 4),
        "parity_vs_reference_ratio": round(p_ratio / REFERENCE_RATIO, 4),
        "parity_decode_bytes_per_s": round(p_dec_rate),
        "parity_encode_bytes_per_s": round(p_enc_rate),
        "parity_config": {"k": pk, "table_log": pL, "bit_pack": True,
                          "block_size": block_size},
    }))
    print(json.dumps({
        "backend": jax.default_backend(),
        "input_bytes": size,
        "compressed_bytes": len(comp),
        "ratio": round(len(comp) / size, 4),
        **times,
        "decode_s_device": round(dec_s, 6),
        "decode_s_device_samples": [round(e, 6) for e in dec_est],
        "encode_s_device": round(enc_s, 6),
        "encode_throughput_device": round(enc_rate),
        "block_size": block_size,
        "k": k,
        "table_log": int(os.environ.get("ECT_BENCH_TABLE_LOG", "8"))
                     if on_tpu else None,
        "parity": {
            "compressed_bytes": len(pcomp),
            "ratio": round(p_ratio, 6),
            "reference_ratio": REFERENCE_RATIO,
            **ptimes,
            "decode_s_device": round(p_dec_s, 6),
            "decode_s_device_samples": [round(e, 6) for e in p_dec_est],
            "decode_throughput_device": round(p_dec_rate),
            "encode_s_device": round(p_enc_s, 6),
            "encode_throughput_device": round(p_enc_rate),
            "k": pk, "table_log": pL, "bit_pack": True,
        },
    }), file=sys.stderr)


if __name__ == "__main__":
    main()
