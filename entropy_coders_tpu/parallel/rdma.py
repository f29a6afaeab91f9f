"""Pallas async remote-copy (RDMA) collectives: comm/compute overlap.

The default multi-chip paths ride XLA collectives (``psum`` /
``all_gather`` inserted by the partitioner — parallel/sharding.py),
which is the right default: XLA schedules them. This module is the
hand-scheduled alternative SURVEY.md §5 calls for ("optionally Pallas
``make_async_remote_copy`` RDMA kernels for overlap"): a ring
all-gather where each hop's inter-chip DMA is IN FLIGHT while the
kernel accumulates the chunk received on the previous hop — overlap
XLA cannot express across a collective boundary.

Codec use cases:

* ``ring_all_reduce_histograms`` — the shared-table histogram
  all-reduce (256 counters per chip): partial sums accumulate behind
  the in-flight DMA of the next chunk.
* ``ring_all_gather`` — ordered gather of equal-size per-chip payload
  chunks (the fixed-size-slot form of the multi-chip section gather).

Ring schedule (unidirectional, n-1 hops): at hop ``s`` device ``d``
forwards slot ``(d - s) mod n`` — the chunk it received on hop ``s-1``
(its own chunk at s=0) — to its right neighbor, which stores it at the
same slot index; every slot travels the full ring in order.

Validated in Pallas TPU interpret mode on a virtual CPU mesh
(tests/test_rdma.py asserts equality with ``lax.all_gather``/``psum``);
real-ICI runs need a multi-chip slice, which this sandbox lacks.

Pattern reference: the public JAX Pallas distributed guide
(docs.jax.dev/en/latest/pallas/tpu/distributed.html).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_all_gather", "ring_all_reduce_histograms"]


def _all_gather_kernel(input_ref, output_ref, accum_ref, chunk_s,
                       local_sem, send_sem, recv_sems,
                       *, axis, n, accumulate):
    """One grid step per ring hop (see module docstring's schedule).
    ``output_ref`` lives in ANY/HBM (DMA-only); the accumulate path
    stages each chunk through the VMEM scratch ``chunk_s``."""
    step = pl.program_id(0)
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + 1, n)

    @pl.when(step == 0)
    def _barrier():
        # neighbor start-barrier before the first remote DMA: without it
        # a fast device could write into a neighbor's output buffer
        # before that neighbor's kernel has started (the standard
        # pattern from the JAX Pallas distributed guide)
        sem = pltpu.get_barrier_semaphore()
        left = lax.rem(my_id - 1 + n, n)
        for nb in (left, right):
            pltpu.semaphore_signal(sem, device_id=(nb,),
                                   device_id_type=pltpu.DeviceIdType.MESH)
        pltpu.semaphore_wait(sem, 2)

    @pl.when(step == 0)
    def _seed():
        # own chunk into its output slot; the accumulator starts from it
        cp = pltpu.make_async_copy(input_ref, output_ref.at[my_id],
                                   local_sem)
        cp.start()
        cp.wait()
        if accumulate:
            pltpu.sync_copy(input_ref, chunk_s)
            accum_ref[...] = chunk_s[...]

    # the chunk received on hop step-1 (own chunk at step 0): forward it
    src_slot = lax.rem(my_id - step + n, n)
    rdma = pltpu.make_async_remote_copy(
        src_ref=output_ref.at[src_slot],
        dst_ref=output_ref.at[src_slot],
        send_sem=send_sem,
        recv_sem=recv_sems.at[step],
        device_id=(right,),
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    rdma.start()
    if accumulate:
        # overlap: add the chunk received on the previous hop while this
        # hop's DMA is on the wire (it is exactly the chunk being
        # forwarded, a read the in-flight send also performs — no race)
        @pl.when(step > 0)
        def _acc():
            pltpu.sync_copy(output_ref.at[src_slot], chunk_s)
            accum_ref[...] = accum_ref[...] + chunk_s[...]

    rdma.wait()  # send drained AND this hop's incoming chunk landed

    if accumulate:
        @pl.when(step == n - 2)
        def _last():
            # the final hop's arrival (slot (my_id+1) mod n) happens
            # after the last grid step's wait; fold it in here
            pltpu.sync_copy(output_ref.at[lax.rem(my_id + 1, n)], chunk_s)
            accum_ref[...] = accum_ref[...] + chunk_s[...]


def _ring_call(chunk, *, axis, n, accumulate, interpret):
    kern = functools.partial(_all_gather_kernel, axis=axis, n=n,
                             accumulate=accumulate)
    zeros = (0,) * chunk.ndim
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(chunk.shape, lambda s: zeros)],
        grid=(n - 1,),
        scratch_shapes=[
            pltpu.VMEM(chunk.shape, chunk.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((n - 1,)),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((n,) + chunk.shape, chunk.dtype),
                 jax.ShapeDtypeStruct(chunk.shape, chunk.dtype)]
    ip = pltpu.InterpretParams() if interpret else False
    return pl.pallas_call(
        kern, out_shape=out_shape, grid_spec=grid_spec, interpret=ip,
        # barrier semaphores require a collective_id shared by every
        # device participating in the same logical collective
        compiler_params=pltpu.CompilerParams(collective_id=7),
    )(chunk)


def ring_all_gather(x, mesh, *, axis=None, interpret=False):
    """All-gather ``x`` (sharded over ``mesh``'s only axis on its leading
    dim) via the Pallas ring. Returns the full array replicated on every
    device — equal to ``lax.all_gather(..., tiled=True)``. ``interpret``
    selects the Pallas TPU interpret mode (CPU testing)."""
    axis = axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    if n == 1:
        return jnp.asarray(x)
    spec = jax.sharding.PartitionSpec(axis)

    def shard_fn(xs):  # xs: this shard's (lead/n, ...) slice
        gathered, _ = _ring_call(xs, axis=axis, n=n, accumulate=False,
                                 interpret=interpret)
        return gathered.reshape((-1,) + xs.shape[1:])

    return jax.shard_map(shard_fn, mesh=mesh, in_specs=spec,
                         out_specs=jax.sharding.PartitionSpec(),
                         check_vma=False)(x)


def ring_all_reduce_histograms(counts, mesh, *, axis=None,
                               interpret=False):
    """Sum per-chip histogram counters (``(devices, 256)`` int32,
    sharded over the mesh) with the overlapped ring kernel: each hop's
    DMA is in flight while the previous hop's chunk adds into the
    accumulator. Returns the replicated (256,) total, equal to
    ``psum`` (parallel/sharding.py's XLA path)."""
    axis = axis or mesh.axis_names[0]
    n = mesh.shape[axis]
    counts = jnp.asarray(counts, jnp.int32)
    if n == 1:
        return counts.reshape(256)
    spec = jax.sharding.PartitionSpec(axis)

    def shard_fn(xs):  # xs: (1, 256) — this chip's counters
        _, accum = _ring_call(xs.reshape(2, 128), axis=axis, n=n,
                              accumulate=True, interpret=interpret)
        return accum.reshape(256)

    # every shard computes the identical total -> replicated output
    return jax.shard_map(shard_fn, mesh=mesh, in_specs=spec,
                         out_specs=jax.sharding.PartitionSpec(),
                         check_vma=False)(counts)
