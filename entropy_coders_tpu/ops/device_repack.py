"""Device-side lane-stream repack (measured alternative to the host merge).

The wire format concatenates k per-lane bit streams (byte- or
bit-aligned); the kernels want the padded ``(W, k)`` word-column layout.
That repack ships on the HOST (C++ OpenMP ``lane_merge_batch`` /
``lane_split_batch``, ~1.2 GB/s per core) — PERF.md argues byte-granular
device compaction is TPU-hostile, but the encoder already does
variable-length bit packing as a prefix-sum scatter-add
(ops/coder.py:110-120), so the same formulation applied to whole lane
WORDS is the honest device-side candidate (VERDICT r4 item 4):

* merge: every lane word ``words[j, i]`` (32 bits, last word masked)
  lands at bit offset ``lane_off[i] + 32*j`` of the packed stream — two
  32-bit scatter-adds (lo/hi spill) at exact prefix-sum offsets, so
  adds never carry (disjoint bit ranges);
* split: the inverse is two gathers at the same offsets plus a
  shift-combine.

Both are word-granular (32-bit pieces), not byte-granular — the unit the
VPU actually moves. Measured on the real chip (round 5, shipping shape:
8x 16 MiB blocks, k=16384, L=8, 61.4 MB wire; PERF.md "device-side lane
merge — measured"): device merge 0.17 GB/s, device split 0.19 GB/s,
bytes exact — vs 0.50 / 0.32 GB/s for the single-core host OpenMP
repack on the same payloads (0.59 byte-aligned). XLA's TPU scatter-add
serializes (it cannot prove the duplicate-index adds disjoint) and the
computed-index gather fares no better; the host path also scales with
cores while this cannot, so the host repack stays (frame keeps it).
The module remains as the measured negative result, with CPU-verified
byte-exactness tests (tests/test_device_repack.py) so the formulation
is re-runnable when a future XLA changes the scatter lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _masked_words(words, sizes, W):
    """(W, k) words with each lane's bits above ``sizes`` zeroed (the
    padded layout guarantees whole words above the last are zero, but
    the last partial word may carry kernel guard bits)."""
    j = jnp.arange(W, dtype=jnp.int32)[:, None]
    rem = sizes[None, :] - (j << 5)  # bits of this word still in-stream
    full = rem >= 32
    mask = jnp.where(full, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.clip(rem, 0, 31).astype(
                         jnp.uint32)) - jnp.uint32(1))
    return words & mask, rem


@functools.partial(jax.jit, static_argnames=("W", "OW"))
def merge_bits_device(words, sizes, *, W, OW):
    """Bit-pack k lane streams on device: ``words (W, k) uint32`` +
    ``sizes (k,) int32`` -> ``(OW,) uint32`` packed stream (lane i at bit
    offset ``cumsum(sizes)[:i]``, LSB-first — byte-identical to
    ``pl_coder.lane_merge_bits``). ``OW`` >= total_words + 1."""
    k = sizes.shape[0]
    v, rem = _masked_words(words, sizes, W)
    off_lane = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(sizes)[:-1]])
    j = jnp.arange(W, dtype=jnp.int32)[:, None]
    off = off_lane[None, :] + (j << 5)
    valid = rem > 0
    d = jnp.where(valid, off >> 5, OW + 1)  # OOB -> dropped
    b = (off & 31).astype(jnp.uint32)
    lo = v << b
    hi = (v >> 1) >> (jnp.uint32(31) - b)
    out = jnp.zeros((OW,), jnp.uint32)
    out = out.at[d.ravel()].add(lo.ravel(), mode="drop")
    out = out.at[(d + 1).ravel()].add(hi.ravel(), mode="drop")
    return out


@functools.partial(jax.jit, static_argnames=("W",))
def split_bits_device(packed, sizes, *, W):
    """Inverse of ``merge_bits_device``: gather each lane's words out of
    the packed stream into the padded ``(W, k)`` layout."""
    off_lane = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(sizes)[:-1]])
    j = jnp.arange(W, dtype=jnp.int32)[:, None]
    off = off_lane[None, :] + (j << 5)
    d = off >> 5
    b = (off & 31).astype(jnp.uint32)
    pad = jnp.concatenate([packed, jnp.zeros(2, jnp.uint32)])
    lo = pad[d] >> b
    hi = (pad[d + 1] << 1) << (jnp.uint32(31) - b)
    w = lo | hi
    wm, _ = _masked_words(w, sizes, W)
    return wm


def merge_bits_np(words: np.ndarray, sizes: np.ndarray) -> bytes:
    """Host-run reference wrapper used by the tests (same bytes as
    pl_coder.lane_merge_bits)."""
    from .pl_coder import lane_merge_bits

    return lane_merge_bits(words, sizes)
