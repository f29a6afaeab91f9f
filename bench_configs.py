"""The five BASELINE.json benchmark configs, with local stand-in corpora.

enwik8/enwik9/Silesia cannot be fetched in this sandbox (no egress); the
stand-ins are deterministic local corpora with comparable structure:

* "ascii"  — real repo text (SURVEY/README/PARITY/FORMAT) cycled;
* "mixed"  — text + seeded random bytes + runs (config 2's recipe);
* "corpus" — a large mixed-entropy text-heavy corpus built from all repo
  text plus seeded Zipf-ish noise (the enwik stand-in).

Each config prints one JSON line; run on the real chip for device
numbers. Configs 4 and 5 need 8 chips / multiple hosts — this sandbox
exposes one chip, so they run the same sharded code path on the
available mesh (1 real chip, or 8 virtual CPU devices for correctness)
and report per-chip numbers with a note.
"""

import json
import os
import sys
import time


import numpy as np


def _repo_text() -> bytes:
    root = os.path.dirname(os.path.abspath(__file__))
    buf = b""
    for f in sorted(os.listdir(root)):
        if f.endswith((".md", ".py")):
            buf += open(os.path.join(root, f), "rb").read()
    return buf


def ascii_block(n: int) -> bytes:
    t = _repo_text()
    return (t * (n // len(t) + 1))[:n]


def mixed_buffer(n: int, seed=1) -> bytes:
    """Config 2's recipe: text + random + runs."""
    rng = np.random.default_rng(seed)
    parts, m = [], 0
    while m < n:
        kind = rng.integers(0, 3)
        ln = int(rng.integers(4 << 10, 64 << 10))
        if kind == 0:
            parts.append(ascii_block(ln))
        elif kind == 1:
            parts.append(rng.integers(0, 256, ln, dtype=np.uint8).tobytes())
        else:
            parts.append(bytes([int(rng.integers(0, 256))]) * ln)
        m += ln
    return b"".join(parts)[:n]


def corpus(n: int, seed=2) -> bytes:
    """enwik stand-in: text-heavy with seeded noise mixed in."""
    rng = np.random.default_rng(seed)
    text = np.frombuffer(ascii_block(n), np.uint8).copy()
    # sprinkle Zipf-ish byte noise over 10% of positions so blocks differ
    idx = rng.integers(0, n, n // 10)
    text[idx] = (rng.zipf(1.4, n // 10) % 256).astype(np.uint8)
    return text.tobytes()


def bf16_tensor_bytes(n: int, seed: int = 3) -> bytes:
    """Model-state stand-in (the checkpoint.py domain): bf16 weights at
    layer-realistic scales (per-tensor std sweeping 1e-3..1 like a real
    parameter tree). High-entropy mantissa byte, compressible
    exponent/sign byte."""
    import ml_dtypes

    rng = np.random.default_rng(seed)
    out, m = [], 0
    while m < n:
        ln = int(rng.integers(64 << 10, 1 << 20))
        std = 10.0 ** rng.uniform(-3, 0)
        t = (rng.standard_normal(ln // 2) * std).astype(ml_dtypes.bfloat16)
        b = t.tobytes()
        out.append(b)
        m += len(b)
    return b"".join(out)[:n]


def json_log_bytes(n: int, seed: int = 4) -> bytes:
    """Structured-log stand-in: newline-delimited JSON records with
    repeated keys, monotone timestamps, mixed numeric/string values."""
    rng = np.random.default_rng(seed)
    levels = ["INFO", "WARN", "ERROR", "DEBUG"]
    hosts = [f"worker-{i:03d}" for i in range(32)]
    out, m, ts = [], 0, 1_723_000_000.0
    while m < n:
        ts += float(rng.exponential(0.02))
        rec = {
            "ts": round(ts, 6),
            "level": levels[int(rng.integers(0, 4))],
            "host": hosts[int(rng.integers(0, 32))],
            "step": int(rng.integers(0, 1 << 20)),
            "loss": round(float(rng.gamma(2.0, 0.3)), 5),
            "tokens_per_s": int(rng.integers(10_000, 500_000)),
            "msg": "step completed" if rng.random() < 0.9
                   else "retrying collective (transient ICI timeout)",
        }
        b = (json.dumps(rec, separators=(",", ":")) + "\n").encode()
        out.append(b)
        m += len(b)
    return b"".join(out)[:n]


def mixed_corpus(n: int, seed: int = 5) -> bytes:
    """Deterministic mixed corpus (VERDICT r4 item 5): source text +
    bf16 tensor bytes + JSON-log bytes in 1/3 shares, interleaved in
    256 KiB stripes so every 16 MiB bench block sees all three."""
    third = n // 3
    parts = [np.frombuffer(corpus(third, seed), np.uint8),
             np.frombuffer(bf16_tensor_bytes(third, seed + 1), np.uint8),
             np.frombuffer(json_log_bytes(n - 2 * third, seed + 2),
                           np.uint8)]
    stripe = 256 << 10
    out, idx = [], [0, 0, 0]
    while sum(idx) < n:
        for j, p in enumerate(parts):
            if idx[j] < len(p):
                out.append(p[idx[j]: idx[j] + stripe])
                idx[j] += stripe
    return b"".join(x.tobytes() for x in out)[:n]


def _sync(r):
    import jax
    np.asarray(jax.tree.leaves(r)[0].ravel()[0:1])


def _device_decode_gbps(comp: bytes, block_size: int, k: int) -> float:
    """Marginal device decode throughput for a PL frame."""
    import jax
    import jax.numpy as jnp

    from entropy_coders_tpu import frame as F
    from entropy_coders_tpu.ops import pl_coder as PL
    from entropy_coders_tpu.spec.fse import DecodeTable
    from entropy_coders_tpu.spec.histogram import NormHistogram

    pf = F._parse_frame(comp)
    R = block_size // k - 1
    idx = [j for j in range(pf.n_blocks) if pf.modes[j] == F.MODE_FSE_PL]
    B = len(idx)
    shared_norm = NormHistogram.read(pf.shared_hdr)[0] if pf.shared else None
    sizes_list, words_list, norms, L = [], [], [], None
    for j in idx:
        if pf.shared:
            norm, sec = shared_norm, pf.section(j)
        else:
            norm, sec = NormHistogram.read(pf.section(j))
        if L is None:
            L = norm.log2
        if norm.log2 != L:  # rare odd-log2 block: keep rows in lockstep
            continue
        sz = np.frombuffer(sec[: 2 * k], "<u2").astype(np.int32)
        w, _ = PL.lane_split(sec[2 * k:], sz, k)
        sizes_list.append(sz)
        words_list.append(w)
        norms.append(norm)
    packs = [DecodeTable(n).packed for n in norms]
    small = PL.upack_ok_packed(packs, L)
    tbls = [PL.decode_table_rows(p, L, small) for p in packs]
    sizes = np.stack(sizes_list)
    B = len(words_list)
    W = -(-max(w.shape[0] for w in words_list) // 16) * 16
    # fuse small-k blocks into superblocks exactly as decode_lanes does
    Ff = max(1, min(B, PL.FUSE_LANES // k))
    B = B - B % Ff  # drop the ragged remainder for the throughput number
    words = np.zeros((B, W, k), np.uint32)
    for jj in range(B):
        words[jj, : words_list[jj].shape[0]] = words_list[jj]
    Bf, kf, S = B // Ff, Ff * k, Ff * k // 128
    wordsf = np.ascontiguousarray(
        words.reshape(Bf, Ff, W, k).transpose(0, 2, 1, 3))
    aw = jnp.asarray(wordsf.view(np.int32).reshape(Bf, W, S, 128))
    asz = jnp.asarray(sizes[:B].reshape(Bf, S, 128))
    atb = jnp.asarray(PL._expand_tbl(tbls[:B], k // 128, Ff))
    call = lambda: PL._decode_call(aw, asz, atb, S=S, W=W, L=L, R=R)
    r = call()
    assert int(np.asarray(r[2]).sum()) == 0
    _sync(r)
    # median of 3 marginal batches, 24 pipelined calls each: small
    # workloads decode in ~1 ms, so the pipeline must dwarf the fixed
    # ~40 ms sync RPC of this sandbox's tunnel
    nn, est = 24, []
    for _ in range(3):
        t0 = time.perf_counter(); _sync(call()); t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        rs = [call() for _ in range(nn)]
        _sync(rs[-1])
        tn = time.perf_counter() - t0
        m = (tn - t1) / (nn - 1)
        est.append(m if m > t1 / 100 else tn / nn)
    m = float(np.median(est))
    return B * block_size / m / 1e9


def config1():
    """64 KiB ASCII, single stream, 12-bit table (the reference's own
    shape); serial spec codec for exactness + native C++ for speed."""
    import entropy_coders_tpu as ect
    from entropy_coders_tpu import native

    data = ascii_block(64 << 10)
    frame = bytearray()
    hist, bits = ect.fse_compress(data, frame, k=1,
                                  hist=ect.Histogram(data).normalize(12))
    out = bytearray()
    assert ect.fse_decompress(frame, out, k=1) == len(data)
    assert bytes(out) == data
    res = {"config": 1, "workload": "64KiB ascii, k=1, L=12",
           "ratio": round(len(frame) / len(data), 4), "roundtrip": "exact"}
    if native.available():
        nf = native.compress(data, k=1)
        t0 = time.perf_counter()
        for _ in range(20):
            native.decompress(nf, k=1, max_out=len(data) + 16)
        res["host_decode_MBps"] = round(len(data) * 20 /
                                        (time.perf_counter() - t0) / 1e6)
    return res


def config2():
    """1 MiB mixed-entropy, 4 interleaved streams; k=2 is the reference's
    own frame format, k=4 the documented generalization (the reference
    defines no 4-stream format). Bulk round trips run on the C++ native
    codec; the Python spec cross-checks it byte-for-byte on a slice."""
    import entropy_coders_tpu as ect
    from entropy_coders_tpu import native

    data = mixed_buffer(1 << 20)
    nf2 = native.compress(data, k=2)
    nf4 = native.compress(data, k=4)
    assert native.decompress(nf2, k=2, max_out=len(data) + 16) == data
    assert native.decompress(nf4, k=4, max_out=len(data) + 16) == data
    # spec (exact reference semantics) == native, byte-for-byte, on a slice
    sl = data[: 48 << 10]
    for k in (2, 4):
        f = bytearray()
        ect.fse_compress(sl, f, k=k)
        assert bytes(f) == native.compress(sl, k=k), f"k={k} frame mismatch"
    return {"config": 2, "workload": "1MiB mixed, k=4 (+k=2 ref-identical)",
            "ratio_k2": round(len(nf2) / len(data), 4),
            "ratio_k4": round(len(nf4) / len(data), 4),
            "bit_exact": "k<=2 reference format; spec==native byte-for-byte"}


def config3(on_tpu: bool):
    """enwik8 stand-in: 32 MiB corpus, 128 KiB blocks, per-block tables,
    1024+ lanes per block, 1 chip."""
    from entropy_coders_tpu import frame as F

    data = corpus(32 << 20)
    bs, k = 128 << 10, 1024
    t0 = time.perf_counter()
    comp = F.compress(data, block_size=bs, k=k, lanes=on_tpu,
                      interpret=not on_tpu)
    t_c = time.perf_counter() - t0
    out = F.decompress(comp, interpret=not on_tpu)
    assert out == data
    res = {"config": 3, "workload": "32MiB text corpus, 128KiB blocks, k=1024",
           "ratio": round(len(comp) / len(data), 4),
           "compress_s_e2e": round(t_c, 2)}
    if on_tpu:
        res["device_decode_GBps"] = round(_device_decode_gbps(comp, bs, k), 2)
    return res


def config4(on_tpu: bool):
    """enwik9-on-8-chips stand-in: shared-table broadcast + ordered
    gather on the available mesh (this sandbox: 1 real chip; the same
    code path runs the 8-virtual-device CPU mesh in the test suite)."""
    import jax
    from entropy_coders_tpu import frame as F
    from entropy_coders_tpu import parallel

    data = corpus(64 << 20)
    bs, k = 4 << 20, 8192
    mesh = parallel.default_mesh()
    sh = parallel.block_sharding(mesh)
    comp = F.compress(data, block_size=bs, k=k, shared_table=True,
                      lanes=on_tpu, interpret=not on_tpu, sharding=sh)
    out = F.decompress(comp, sharding=sh, interpret=not on_tpu)
    assert out == data
    res = {"config": 4,
           "workload": "64MiB corpus, shared table, mesh-sharded blocks",
           "n_devices": mesh.size,
           "ratio": round(len(comp) / len(data), 4)}
    if on_tpu:
        res["device_decode_GBps"] = round(_device_decode_gbps(comp, bs, k), 2)
        res["note"] = "1 chip in this sandbox; scaling validated on 8 virtual devices in tests"
    return res


def config5():
    """Multi-host pipeline: the pod itself is not available here (single
    host, single chip), but the pipeline (parallel.multihost: per-host
    owned-block compress, DCN allgather, ordered assembly, per-host range
    decode) runs for REAL as two JAX processes over gloo in
    tests/test_multihost.py, producing the byte-identical frame a single
    process makes."""
    return {"config": 5, "workload": "Silesia+enwik9, multi-host v5e-16",
            "status": "pod unavailable in this sandbox; multi-host "
                      "pipeline itself runs as 2 real JAX processes "
                      "(tests/test_multihost.py, parallel.multihost)"}


def config6(on_tpu: bool):
    """Corpus-diversity report (VERDICT r4 item 5): ratio per corpus at
    the two shipping operating points — the throughput headline (16 MiB
    blocks, k=16384, L=8) and the size-parity point (k=8192, L=11,
    bit-packed) — so the ratio claims rest on more than one synthetic
    distribution. 32 MiB per corpus, deterministic builders above."""
    from bench import gen_sequence
    from entropy_coders_tpu import frame as F

    n = 32 << 20
    names = {
        "geo(bench)": gen_sequence(0.2, n).tobytes(),
        "text": corpus(n),
        "bf16": bf16_tensor_bytes(n),
        "jsonlog": json_log_bytes(n),
        "mixed": mixed_corpus(n),
    }
    bs = 16 << 20
    rows = {}
    for name, data in names.items():
        c_thr = F.compress(data, block_size=bs, k=16384, table_log=8,
                           lanes=on_tpu, interpret=not on_tpu)
        c_par = F.compress(data, block_size=bs, k=8192, table_log=11,
                           bit_pack=True, lanes=on_tpu,
                           interpret=not on_tpu)
        assert F.decompress(c_thr, interpret=not on_tpu) == data
        assert F.decompress(c_par, interpret=not on_tpu) == data
        row = {"ratio_throughput_L8": round(len(c_thr) / n, 4),
               "ratio_parity_L11_packed": round(len(c_par) / n, 4)}
        if on_tpu:
            row["device_decode_GBps_L8"] = round(
                _device_decode_gbps(c_thr, bs, 16384), 2)
        rows[name] = row
    return {"config": 6, "workload": "corpus diversity, 32MiB each",
            "corpora": rows}


def main():
    import jax
    on_tpu = jax.default_backend() == "tpu"
    which = [int(x) for x in sys.argv[1:]] or [1, 2, 3, 4, 5, 6]
    for i in which:
        fn = {1: config1, 2: config2, 3: lambda: config3(on_tpu),
              4: lambda: config4(on_tpu), 5: config5,
              6: lambda: config6(on_tpu)}[i]
        t0 = time.perf_counter()
        res = fn()
        res["wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
