"""On-chip validation + A/B of the u-packed decode layout at L=11.

The bench geometric corpus disqualifies u-pack above L=10 (max count
410 > 256 at L=11), so this uses a ~101-symbol near-uniform corpus
(max count ~20/2048) — the flat-distribution regime where high-log
u-pack fires. Round-4 lesson: interpret mode cannot catch Mosaic
lowering bugs, so the new hi_n=8 u-pack rows must run on the real chip
once. Bytes are asserted against the input and against the split
layout.

Usage: python tools/upack_hilog.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from entropy_coders_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _parse_pl_frame, _marginal  # noqa: E402
from entropy_coders_tpu import frame as F  # noqa: E402
from entropy_coders_tpu.ops import pl_coder as PL  # noqa: E402
from entropy_coders_tpu.spec.fse import DecodeTable  # noqa: E402
from entropy_coders_tpu.spec.histogram import NormHistogram  # noqa: E402

L = 11
size = 64 << 20
bs, k = 16 << 20, 16384
rng = np.random.default_rng(0xA11)
# skewed-but-flat 101-symbol corpus: no symbol near 256/2048 of the mass
data = (rng.integers(0, 40, size, dtype=np.uint16) ** 2 % 101).astype(
    np.uint8)

comp = F.compress(data, block_size=bs, k=k, lanes=True, table_log=L)
# the REAL user path: frame.decompress auto-detects u-pack on-chip
assert F.decompress(comp) == data.tobytes()
print("frame round trip (auto u-pack) ok", flush=True)

sizes, payloads, norm_tables, L2, _ = _parse_pl_frame(comp, bs, k)
assert L2 == L
assert PL.upack_ok(norm_tables, L), int(norm_tables.max())
R = bs // k - 1
B = len(payloads)
W = -(-(int(sizes.max()) // 32 + 3) // 16) * 16
words = PL.lane_split_batch(payloads, sizes, k, W)
S = k // 128
a_words = jnp.asarray(np.ascontiguousarray(words).view(np.int32)
                      .reshape(B, W, S, 128))
a_sizes = jnp.asarray(sizes.reshape(B, S, 128))
packs = [DecodeTable(NormHistogram(norm_tables[j], L,
                                   F._tl(norm_tables[j]))).packed
         for j in range(B)]
exp = data.reshape(B, R + 1, S * 128)[:, :R]
for name, small in (("u-packed", True), ("split", False)):
    rows = np.stack([PL.decode_table_rows(p, L, small) for p in packs])
    a_tbl = jnp.asarray(rows[:, :, None, :])
    call = lambda: PL._decode_call(a_words, a_sizes, a_tbl, S=S, W=W,  # noqa: E731
                                   L=L, R=R)
    r = call()
    assert int(jnp.sum(r[2])) == 0
    got = np.asarray(r[0][:, :R]).reshape(exp.shape)
    assert np.array_equal(got, exp), f"{name}: wrong bytes"
    m, est = _marginal(call, n=12, batches=3)
    print(f"L=11 {name} ({rows.shape[1]} rows): {m*1e3:.2f} ms = "
          f"{size/m/1e9:.1f} GB/s  "
          f"({['%.2f' % (e*1e3) for e in est]})", flush=True)
