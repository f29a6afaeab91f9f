"""Device-side byte histogram.

The reference's hot counting loop uses 4 ILP sub-tables
(reference: src/histogram.rs:18-66). On TPU the data-dependent scatter
that a histogram "is" maps poorly to the VPU (XLA lowers ``.at[].add``
to a sorted scatter: measured 1.19 s for 128 MiB on v5e). The shipped
form is scatter-free: one masked reduction per symbol value,

    counts[s] = sum(data == s)

scanned over the 256 symbols — 256 streaming passes over VMEM-resident
tiles, fully vectorized (measured 64 ms for 128 MiB on v5e, ~20x the
scatter; also ~1.5x an MXU one-hot-matmul formulation, which paid for
materializing the one-hot tiles). On CPU backends the scatter form wins
and is used instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import ALPHABET


@jax.jit
def _hist_blocks_scatter(data_blocks):
    def one(d):
        return (
            jnp.zeros((ALPHABET,), jnp.int32).at[d.astype(jnp.int32)].add(1)
        )
    return jax.vmap(one)(data_blocks).astype(jnp.uint32)


@jax.jit
def _hist_blocks_eqsum(data_blocks):
    B, n = data_blocks.shape
    x = data_blocks.reshape(B, -1, 128) if n % 128 == 0 else data_blocks
    sym = jnp.arange(ALPHABET, dtype=jnp.uint8)

    def count_one(carry, s):
        axes = tuple(range(1, x.ndim))
        return carry, jnp.sum((x == s).astype(jnp.int32), axis=axes)

    _, counts = jax.lax.scan(count_one, 0, sym)
    return counts.T.astype(jnp.uint32)  # (B, 256)


def histogram_blocks(data_blocks):
    """(B, n) uint8 -> (B, 256) uint32 per-block counts, with the
    backend-appropriate kernel (see module docstring)."""
    data_blocks = jnp.asarray(data_blocks)
    if jax.default_backend() == "cpu":
        return _hist_blocks_scatter(data_blocks)
    return _hist_blocks_eqsum(data_blocks)


def histogram_u8(data):
    """(n,) uint8 -> (256,) uint32."""
    return histogram_blocks(jnp.asarray(data)[None])[0]
