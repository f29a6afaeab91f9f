"""Device-side byte histogram.

The reference's hot counting loop uses 4 ILP sub-tables
(reference: src/histogram.rs:18-66). On TPU the two idiomatic forms are:

* ``scatter-add`` — one ``.at[data].add(1)``; XLA lowers to a sorted
  scatter on TPU;
* ``one-hot matmul`` — compare-and-sum rides the MXU: for a (C,) chunk,
  ``ones(1, C) @ (chunk[:, None] == iota[None, :])``.

Both are exposed; ``histogram_u8`` picks the matmul form on TPU
(measured faster there) and scatter on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..constants import ALPHABET


@jax.jit
def histogram_scatter(data):
    """(n,) uint8 -> (256,) uint32 via scatter-add."""
    return (
        jnp.zeros((ALPHABET,), jnp.int32)
        .at[data.astype(jnp.int32)]
        .add(1)
        .astype(jnp.uint32)
    )


@partial(jax.jit, static_argnames=("chunk",))
def histogram_matmul(data, *, chunk: int = 4096):
    """(n,) uint8 -> (256,) uint32 via one-hot matmul on the MXU.

    n must be a multiple of ``chunk`` (callers pad; pad bytes must be
    subtracted by the caller, or pass data padded with a sentinel and
    correct count 0). Uses f32 accumulation: each chunk contributes at
    most ``chunk`` to a bucket and chunk <= 2**24, so sums are exact.
    """
    n = data.shape[0]
    d = data.reshape(n // chunk, chunk).astype(jnp.int32)
    iota = jnp.arange(ALPHABET, dtype=jnp.int32)
    onehot = (d[:, :, None] == iota[None, None, :]).astype(jnp.float32)
    per_chunk = jnp.sum(onehot, axis=1)  # (n/chunk, 256)
    return jnp.sum(per_chunk, axis=0).astype(jnp.uint32)


def histogram_u8(data):
    """Histogram with the backend-appropriate kernel."""
    data = jnp.asarray(data)
    if jax.default_backend() == "cpu" or data.shape[0] % 4096 != 0:
        return histogram_scatter(data)
    return histogram_matmul(data)


@jax.jit
def histogram_blocks(data_blocks):
    """(B, n) uint8 -> (B, 256) uint32, batched scatter-add."""
    def one(d):
        return (
            jnp.zeros((ALPHABET,), jnp.int32).at[d.astype(jnp.int32)].add(1)
        )
    return jax.vmap(one)(data_blocks).astype(jnp.uint32)
