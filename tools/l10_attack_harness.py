"""Shared experiment harness: the shipping decode kernel parameterized
by an ``entry_fn(tbl, states, S, L) -> (nb, base, sym)`` so alternative
table layouts can be measured without touching ops/pl_coder (used by
tools/l10_attack.py and the round-5 L=8 u-pack experiment)."""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from entropy_coders_tpu.ops import pl_coder as PL

_shr_u = PL._shr_u
_fetch_chunk = PL._fetch_chunk
_chunk_window = PL._chunk_window
_chunk_select = PL._chunk_select
_read_window = PL._read_window
REFILL_QW = PL.REFILL_QW
_CP = PL._CP
_cdiv = PL._cdiv


def make_kernel(entry_fn):
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


def call_with(entry_fn, tbl_arr, a_words, a_sizes, *, S, W, L, R, B,
              e_rounds=None):
    E = e_rounds or PL._pick_e(L)
    p_refill = PL._pick_p(E, L)
    G = _cdiv(R, E)
    hi_n = tbl_arr.shape[1]
    kern = functools.partial(make_kernel(entry_fn), S=S, W=W, L=L, R=R,
                             G=G, hi_n=hi_n, E=E, p_refill=p_refill)
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
