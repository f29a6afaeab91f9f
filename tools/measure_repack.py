"""Measure device-side lane merge/split vs the host OpenMP repack
(VERDICT r4 item 4) at the shipping shape: 16 MiB blocks, k=16384, L=8
payloads, 8 blocks (128 MiB raw)."""
import sys, time
import numpy as np

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
from entropy_coders_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from bench import gen_sequence, _parse_pl_frame, _sync
from entropy_coders_tpu import frame as F, native
from entropy_coders_tpu.ops import pl_coder as PL
from entropy_coders_tpu.ops import device_repack as DR

size = 128 << 20
bs, k = 16 << 20, 16384
data = gen_sequence(0.2, size)
comp = F.compress(data, block_size=bs, k=k, lanes=True, table_log=8,
                  bit_pack=True)
sizes, payloads, _, L, packed = _parse_pl_frame(comp, bs, k)
B = len(payloads)
payload_bytes = sum(len(p) for p in payloads)
W = -(-(int(sizes.max()) // 32 + 3) // 16) * 16
words = PL.lane_split_batch(payloads, sizes, k, W, pack_bits=True)
print(f"B={B} W={W} payload={payload_bytes/1e6:.1f} MB", flush=True)

# --- host (C++ OpenMP, this sandbox: 1 core) ---
for name, fn in [
    ("host merge_batch(pack)", lambda: PL.lane_merge_batch(words, sizes, pack_bits=True)),
    ("host split_batch(pack)", lambda: PL.lane_split_batch(payloads, sizes, k, W, pack_bits=True)),
    ("host merge_batch(byte)", lambda: PL.lane_merge_batch(words, sizes, pack_bits=False)),
]:
    fn()
    t0 = time.perf_counter(); fn(); t = time.perf_counter() - t0
    print(f"{name}: {t*1e3:.0f} ms = {payload_bytes/t/1e9:.2f} GB/s wire", flush=True)

# --- device ---
totals = sizes.astype(np.int64).sum(axis=1)
OW = int((totals.max() + 31) // 32 + 1)
a_words = jnp.asarray(words)
a_sizes = jnp.asarray(sizes)

import functools
merge1 = functools.partial(DR.merge_bits_device, W=W, OW=OW)
merge_b = jax.jit(jax.vmap(lambda w, s: merge1(w, s)))
split1 = functools.partial(DR.split_bits_device, W=W)
split_b = jax.jit(jax.vmap(lambda p, s: split1(p, s)))

def marginal(call, n=8, batches=3):
    _sync(call())
    est = []
    for _ in range(batches):
        t0 = time.perf_counter(); _sync(call()); t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        rs = [call() for _ in range(n)]
        _sync(rs[-1])
        tn = time.perf_counter() - t0
        m = (tn - t1) / (n - 1)
        est.append(m if m > t1 / 100 else tn / n)
    return float(np.median(est))

t0 = time.perf_counter()
packed_dev = merge_b(a_words, a_sizes)
_sync(packed_dev)
print(f"device merge compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
# correctness first
pd = np.asarray(packed_dev)
for j in range(B):
    nb = (int(totals[j]) + 7) // 8
    assert pd[j].tobytes()[:nb] == payloads[j], f"block {j} merge mismatch"
print("device merge bytes exact", flush=True)

m = marginal(lambda: merge_b(a_words, a_sizes))
print(f"device merge: {m*1e3:.1f} ms = {payload_bytes/m/1e9:.2f} GB/s wire", flush=True)

t0 = time.perf_counter()
back = split_b(packed_dev, a_sizes)
_sync(back)
print(f"device split compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
assert np.array_equal(np.asarray(back), words), "split mismatch"
print("device split words exact", flush=True)
m = marginal(lambda: split_b(packed_dev, a_sizes))
print(f"device split: {m*1e3:.1f} ms = {payload_bytes/m/1e9:.2f} GB/s wire", flush=True)
