"""Default table_log policy sweep (VERDICT r4 item 2 / README open question).

Decides what ``frame.compress``'s default ``table_log`` should be on the
per-lane (MODE_FSE_PL) path by measuring, on the real chip:

1. device decode rate at each fixed table_log L in {8..11}, for both the
   bench config (16 MiB blocks, k=16384) and the library-default config
   (128 KiB blocks, k=1024, superblock-fused);
2. for each candidate policy x corpus: the actual compressed ratio and
   the per-block chosen-L distribution, from which the effective decode
   rate is computed as total_bytes / sum(block_bytes / rate_L) — decode
   kernel time depends only on (R, L, k), not payload entropy, so per-L
   rates transfer across corpora.

Policies: fixed 10 (the pre-round-5 default), "auto" (the reference's
per-block optimal_log2, src/histogram.rs:264-277), ("fast", eps) for
eps in {0.25%, 0.5%, 1%}.

Corpora (deterministic, 32 MiB each): the bench geometric distribution;
the text-heavy enwik stand-in (bench_configs.corpus); bf16 tensor bytes
(the checkpoint.py domain); JSON log lines. Prints one JSON line per
(config, corpus, policy) plus a decision summary.

The committed decision lives in frame.py (PL policy default) and the
results table in PERF.md; re-run this script to reproduce it.
"""

import json
import sys
import time

import numpy as np

from entropy_coders_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bench import gen_sequence  # noqa: E402
from bench_configs import (_device_decode_gbps, bf16_tensor_bytes,  # noqa: E402
                           corpus, json_log_bytes)


CONFIGS = {
    "bench": {"block_size": 16 << 20, "k": 16384},
    "default": {"block_size": 128 << 10, "k": 1024},
}
POLICIES = [
    ("fixed10", 10),
    ("auto", "auto"),
    ("fast_p25", ("fast", 0.0025)),
    ("fast_p50", ("fast", 0.005)),
    ("fast_p100", ("fast", 0.01)),
]
LS = [8, 9, 10, 11]
SIZE = 32 << 20


def corpora():
    return {
        "geo": np.frombuffer(gen_sequence(0.2, SIZE).tobytes(), np.uint8),
        "text": np.frombuffer(corpus(SIZE), np.uint8),
        "bf16": np.frombuffer(bf16_tensor_bytes(SIZE), np.uint8),
        "jsonlog": np.frombuffer(json_log_bytes(SIZE), np.uint8),
    }


def measure_rates(data, cfg) -> dict:
    """Fixed-L device decode rate (GB/s) per table_log, on ``data``."""
    from entropy_coders_tpu import frame as F

    rates = {}
    for L in LS:
        comp = F.compress(data, table_log=L, lanes=True, **cfg)
        out = F.decompress(comp)
        assert out == data.tobytes()
        rates[L] = _device_decode_gbps(comp, cfg["block_size"], cfg["k"])
        print(json.dumps({"rate_point": {"config": cfg, "L": L,
                                         "decode_GBps": round(rates[L], 2),
                                         "ratio": round(len(comp)
                                                        / len(data), 4)}}),
              flush=True)
    return rates


def chosen_logs(data, cfg, table_log):
    """Per-block effective table logs under a policy (host-side only)."""
    from entropy_coders_tpu.normalize import normalize_batch

    bs = cfg["block_size"]
    B = len(data) // bs
    blocks = data[: B * bs].reshape(B, bs)
    counts = np.stack([np.bincount(b, minlength=256) for b in blocks])
    _, log2s = normalize_batch(counts, bs, table_log)
    return log2s


def main():
    import jax

    if jax.default_backend() != "tpu":
        print("policy_sweep needs the real chip", file=sys.stderr)
        sys.exit(1)
    from entropy_coders_tpu import frame as F

    data_by_name = corpora()
    results = []
    for cname, cfg in CONFIGS.items():
        rates = measure_rates(data_by_name["geo"], cfg)
        for dname, data in data_by_name.items():
            for pname, pol in POLICIES:
                t0 = time.perf_counter()
                comp = F.compress(data, table_log=pol, lanes=True, **cfg)
                t_c = time.perf_counter() - t0
                assert F.decompress(comp) == data.tobytes()
                log2s = chosen_logs(data, cfg, pol)
                uniq, cnt = np.unique(log2s, return_counts=True)
                bs = cfg["block_size"]
                eff = len(data) / sum(
                    int(c) * bs / (rates.get(int(l), rates[max(LS)])
                                   * 1e9)
                    for l, c in zip(uniq, cnt))
                row = {
                    "config": cname, "corpus": dname, "policy": pname,
                    "ratio": round(len(comp) / len(data), 4),
                    "eff_decode_GBps": round(eff / 1e9, 2),
                    "logs": {int(l): int(c) for l, c in zip(uniq, cnt)},
                    "compress_s": round(t_c, 2),
                }
                results.append(row)
                print(json.dumps(row), flush=True)
    print(json.dumps({"done": len(results)}))


if __name__ == "__main__":
    main()
