"""Measure the generalized u-packed decode layout at L >= 10 (round 5).

The round-5 generalization admits any table whose alphabet is < 128
symbols and whose max normalized count is <= 256 (u fits 9 bits) — at
L=10 that is "no symbol over a quarter of the table", which the bench
geometric distribution satisfies. Expected: 2^L/256 all-critical gather
rows vs the split layout's 2^L/256 pair + 2^L/512 off-path quad rows,
approaching the 40.2 GB/s pair-only speed-of-light bound measured in
tools/l10_attack.py.

Usage: python tools/upack_l10.py [L]   (default 10)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from entropy_coders_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import gen_sequence, _parse_pl_frame, _marginal  # noqa: E402
from entropy_coders_tpu import frame as F  # noqa: E402
from entropy_coders_tpu.ops import pl_coder as PL  # noqa: E402
from entropy_coders_tpu.spec.fse import DecodeTable  # noqa: E402
from entropy_coders_tpu.spec.histogram import NormHistogram  # noqa: E402

L = int(sys.argv[1]) if len(sys.argv) > 1 else 10
size = 128 << 20
bs, k = 16 << 20, 16384
data = gen_sequence(0.2, size)
comp = F.compress(data, block_size=bs, k=k, lanes=True, table_log=L)
sizes, payloads, norm_tables, L2, _ = _parse_pl_frame(comp, bs, k)
assert L2 == L
R = bs // k - 1
B = len(payloads)
W = -(-(int(sizes.max()) // 32 + 3) // 16) * 16
words = PL.lane_split_batch(payloads, sizes, k, W)
S = k // 128
a_words = jnp.asarray(np.ascontiguousarray(words).view(np.int32)
                      .reshape(B, W, S, 128))
a_sizes = jnp.asarray(sizes.reshape(B, S, 128))
print(f"L={L}: upack_ok={PL.upack_ok(norm_tables, L)} "
      f"(max count {int(norm_tables.max())})", flush=True)

packs = [DecodeTable(NormHistogram(norm_tables[j], L,
                                   F._tl(norm_tables[j]))).packed
         for j in range(B)]
ref_syms = None
for name, small in (("split", False), ("u-packed", True)):
    if small and not PL.upack_ok_packed(packs, L):
        print("u-packed: not eligible on this corpus at this L")
        continue
    rows = np.stack([PL.decode_table_rows(p, L, small) for p in packs])
    a_tbl = jnp.asarray(rows[:, :, None, :])
    call = lambda: PL._decode_call(a_words, a_sizes, a_tbl, S=S, W=W,  # noqa: E731
                                   L=L, R=R)
    r = call()
    assert int(jnp.sum(r[2])) == 0
    got = np.asarray(r[0][:, :R])
    if ref_syms is None:
        ref_syms = got
        exp = data.reshape(B, R + 1, S * 128)[:, :R].reshape(got.shape)
        assert np.array_equal(got, exp), "decode mismatch vs input"
    else:
        assert np.array_equal(got, ref_syms), "layouts disagree"
    m, est = _marginal(call, n=12, batches=3)
    print(f"{name} ({rows.shape[1]} rows): {m*1e3:.2f} ms = "
          f"{size/m/1e9:.1f} GB/s  "
          f"({['%.2f' % (e*1e3) for e in est]})", flush=True)
