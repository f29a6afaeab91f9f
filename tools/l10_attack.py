"""L=10 decode attack experiments (VERDICT r4 item 3).

Variants measured at the shipping shape (16 MiB blocks, k=16384, B=8,
128 MiB raw, L=10):

  base    — shipping split pair/quad kernel (ops.pl_coder._decode_call)
  e2      — same kernel, E=2 epochs (knob)
  nosym   — speed-of-light bound: pair gathers + state chain + bit I/O
            only, symbol OUTPUT COMES FROM THE PAIR WORD'S LOW BITS
            (wrong bytes, right schedule) — bounds what any layout that
            still gathers (nb, base) can reach
  fused   — one 22-bit entry per word (sym<<14|nb<<10|base), single
            8-row gather chain, no quad plane (VERDICT suggestion)
"""
import functools, sys, time
import numpy as np

sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
from entropy_coders_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import gen_sequence, _parse_pl_frame, _sync, _marginal
from entropy_coders_tpu import frame as F
from entropy_coders_tpu.ops import pl_coder as PL
from entropy_coders_tpu.spec.fse import DecodeTable
from entropy_coders_tpu.spec.histogram import NormHistogram

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

packed_tbls = [DecodeTable(NormHistogram(norm_tables[j], L,
                                         F._tl(norm_tables[j]))).packed
               for j in range(B)]
rows_split = np.stack([PL.decode_table_rows(p, L) for p in packed_tbls])
a_tbl = jnp.asarray(rows_split[:, :, None, :])

def run(name, call, check_syms=None):
    r = call()
    err = int(jnp.sum(r[2]))
    assert err == 0, (name, err)
    if check_syms is not None:
        got = np.asarray(r[0][:, :R]).reshape(B, R, S * 128)
        assert np.array_equal(got, check_syms), f"{name}: wrong bytes"
    m, est = _marginal(call, n=12, batches=3)
    print(f"{name}: {m*1e3:.2f} ms = {size/m/1e9:.1f} GB/s  "
          f"({['%.2f' % (e*1e3) for e in est]})", flush=True)
    return size / m / 1e9

# reference decoded symbols for correctness checks
ref_syms = None

# ---- base ----
base_call = lambda: PL._decode_call(a_words, a_sizes, a_tbl, S=S, W=W,
                                    L=L, R=R)
r0 = base_call()
ref_syms = np.asarray(r0[0][:, :R]).reshape(B, R, S * 128)
run("base(split,E=3)", base_call, ref_syms)

# ---- E=2 ----
run("e2(split,E=2)", lambda: PL._decode_call(
    a_words, a_sizes, a_tbl, S=S, W=W, L=L, R=R, e_rounds=2), ref_syms)

# ---- variants with custom kernels ----
_shr_u = PL._shr_u
_gather_rows = PL._gather_rows
_fetch_chunk = PL._fetch_chunk
_chunk_window = PL._chunk_window
_chunk_select = PL._chunk_select
_read_window = PL._read_window
REFILL_QW = PL.REFILL_QW
_CP = PL._CP
_cdiv = PL._cdiv


def make_kernel(entry_fn, hi_n_of):
    def kern(words_ref, sizes_ref, tbl_ref, syms_ref, finals_ref, err_ref,
             state_s, cur_s, wb_s, blo_s, bhi_s, ch_s,
             *, S, W, L, R, G, hi_n, E, p_refill):
        r = pl.program_id(1)
        tbl = tbl_ref[0]

        def words8():
            return words_ref[0].reshape(W // 8, 8, S, 128)

        @pl.when(r == 0)
        def _init_cursors():
            c = sizes_ref[0] - L
            cur_s[:] = c
            wb_s[:] = _shr_u(jnp.maximum(c, 0), 5)

        @pl.when(r % p_refill == 0)
        def _refetch():
            b = wb_s[:] - 6
            if W // 8 > REFILL_QW:
                s, wide = _chunk_window(b, W // 8, REFILL_QW)

                @pl.when(jnp.logical_not(wide))
                def _narrow():
                    sl = words_ref[0, pl.ds(s * 8, REFILL_QW * 8)].reshape(
                        REFILL_QW, 8, S, 128)
                    ch = _fetch_chunk(sl, b, S, qbase=s)
                    for j in range(8):
                        ch_s[j] = ch[j]

                @pl.when(wide)
                def _wide():
                    ch = _fetch_chunk(words8(), b, S)
                    for j in range(8):
                        ch_s[j] = ch[j]
            else:
                ch = _fetch_chunk(words8(), b, S)
                for j in range(8):
                    ch_s[j] = ch[j]

        @pl.when(r == 0)
        def _init_window():
            c, wb = cur_s[:], wb_s[:]
            ch = [ch_s[j] for j in range(8)]
            blo = _chunk_select(ch, wb)
            bhi = _chunk_select(ch, wb + 1)
            state_s[:] = _read_window(blo, bhi, c - wb * 32,
                                      jnp.full((S, 128), L, jnp.int32))
            blo_s[:] = blo
            bhi_s[:] = bhi

        states, c = state_s[:], cur_s[:]
        wb, blo, bhi = wb_s[:], blo_s[:], bhi_s[:]
        ch = [ch_s[j] for j in range(8)]

        slide = (c - wb * 32) < E * L
        wb2 = wb - 1
        nv = _chunk_select(ch, wb2)
        bhi = jnp.where(slide, blo, bhi)
        blo = jnp.where(slide, nv, blo)
        wb = jnp.where(slide, wb2, wb)

        exact = R % E == 0
        for e in range(E):
            nb, base, sym = entry_fn(tbl, states, S, L)
            if not exact:
                active = (r * E + e) < R
                nb = jnp.where(active, nb, 0)
            c = c - nb
            low = _read_window(blo, bhi, c - wb * 32, nb)
            ns = base + low
            states = ns if exact else jnp.where(active, ns, states)
            syms_ref[0, e] = sym.astype(jnp.uint8)

        state_s[:], cur_s[:] = states, c
        wb_s[:], blo_s[:], bhi_s[:] = wb, blo, bhi

        @pl.when(r == G - 1)
        def _fin():
            _, _, sym = entry_fn(tbl, states, S, L)
            finals_ref[0] = sym
            err_ref[0, 0, 0] = jnp.sum(jnp.abs(c))
    return kern


def call_with(kern_factory, entry_fn, tbl_arr, e_rounds=None):
    E = e_rounds or PL._pick_e(L)
    p_refill = PL._pick_p(E, L)
    G = _cdiv(R, E)
    hi_n = tbl_arr.shape[1]
    kern = functools.partial(make_kernel(entry_fn, None), S=S, W=W, L=L,
                             R=R, G=G, hi_n=hi_n, E=E, p_refill=p_refill)
    scr = pltpu.VMEM((S, 128), jnp.int32)
    fn = pl.pallas_call(
        kern,
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, W, S, 128), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hi_n, tbl_arr.shape[2], 128),
                         lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, E, S, 128), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G * E, S, 128), jnp.uint8),
            jax.ShapeDtypeStruct((B, S, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ],
        scratch_shapes=[scr, scr, scr, scr, scr,
                        pltpu.VMEM((8, S, 128), jnp.int32)],
        compiler_params=_CP,
    )
    f = jax.jit(lambda w, s, t: fn(w, s, t))
    return lambda: f(a_words, a_sizes, tbl_arr)


# ---- nosym: pair gathers only, sym = junk from pair word ----
def entry_nosym(tbl, states, S, L):
    h2 = max((1 << L) // 256, 1)
    vp = _gather_rows(tbl[:h2], _shr_u(states, 1), h2, S)
    half = jnp.where((states & 1) == 1, _shr_u(vp, 16), vp & 0xFFFF)
    nb = _shr_u(half, 12)
    base = half & 0xFFF
    return nb, base, half & 0xFF  # junk symbol, right schedule

rows_pairs = rows_split[:, : max((1 << L) // 256, 1)]
run("nosym(pairs only)", call_with(None, entry_nosym,
                                   jnp.asarray(rows_pairs[:, :, None, :])))

# ---- fused: 22-bit single plane ----
pk = np.stack(packed_tbls).astype(np.int64)  # sym<<24|nb<<16|base
nb_ = (pk >> 16) & 0xFF
base_ = pk & 0xFFFF
sym_ = pk >> 24
assert nb_.max() <= L and base_.max() < (1 << L)
fused = (sym_ << (L + 4)) | (nb_ << L) | base_
rows_fused = PL._rows_np(fused)

def entry_fused(tbl, states, S, L):
    hn = max((1 << L) // 128, 1)
    v = _gather_rows(tbl, states, hn, S)
    base = v & ((1 << L) - 1)
    nb = _shr_u(v, L) & 0xF
    sym = _shr_u(v, L + 4) & 0xFF
    return nb, base, sym

run("fused(22b,1 plane)", call_with(None, entry_fused,
                                    jnp.asarray(rows_fused[:, :, None, :])),
    ref_syms)
