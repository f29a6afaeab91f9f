"""Encode epoch-unroll A/B at the bench shape (round 5).

Decode's u-packed rows made E=4 the winning unroll there (PERF.md);
this measures the encode side, where E=4 does NOT divide the shipping
R=1023 and therefore needs the back-aligned packed path (pad_back=1,
_encode_call_packed) added in round 5. The wire must be IDENTICAL
across E (E only changes scheduling), asserted below.

Usage: python tools/enc_e4.py [L]   (default 8)
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
from entropy_coders_tpu.spec.fse import EncodeTable  # noqa: E402
from entropy_coders_tpu.spec.histogram import NormHistogram  # noqa: E402

L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
size = 128 << 20
bs, k = 16 << 20, 16384
data = gen_sequence(0.2, size)
comp = F.compress(data, block_size=bs, k=k, lanes=True, table_log=L)
_, _, norm_tables, L2, _ = _parse_pl_frame(comp, bs, k)
assert L2 == L
B = norm_tables.shape[0]
S = k // 128
R = bs // k - 1
W = PL.encode_w_bound(R, L)
small = bool((norm_tables[:, 128:] == 0).all())
symt, stt = [], []
for j in range(B):
    norm = NormHistogram(norm_tables[j], L, F._tl(norm_tables[j]))
    et = EncodeTable(norm)
    sr, tr = PL.pack_enc_table_rows(et.table, et.tt_bits,
                                    et.tt_find_state, L, small)
    symt.append(sr)
    stt.append(tr)
blocks4 = jnp.asarray(data.reshape(B, R + 1, S, 128))
a_symt = jnp.asarray(np.stack(symt)[:, :, None, :])
a_stt = jnp.asarray(np.stack(stt)[:, :, None, :])

ref = None
for E in (3, 4):
    pad_back = -(-R // E) * E - R
    if pad_back > 1:
        print(f"E={E}: needs pad_back={pad_back} — packed path N/A")
        continue
    call = lambda: PL._encode_call_packed(  # noqa: E731
        blocks4, a_symt, a_stt, S=S, W=W, L=L, R=R, e_rounds=E)
    w, s = call()
    w, s = np.asarray(w), np.asarray(s)
    if ref is None:
        ref = (w, s)
    else:
        assert np.array_equal(ref[1], s), f"E={E}: sizes diverge"
        assert np.array_equal(ref[0], w), f"E={E}: words diverge"
    m, est = _marginal(call, n=12, batches=3)
    print(f"E={E} (pad_back={pad_back}): {m*1e3:.2f} ms = "
          f"{size/m/1e9:.1f} GB/s  "
          f"({['%.2f' % (e*1e3) for e in est]})", flush=True)
