"""Pallas RDMA ring collectives (parallel/rdma.py) vs XLA collectives,
on the 8-virtual-device CPU mesh in TPU interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from entropy_coders_tpu.parallel.rdma import (ring_all_gather,
                                              ring_all_reduce_histograms)

from conftest import gen_sequence


@pytest.fixture(scope="module")
def mesh():
    n = jax.device_count()
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    return jax.make_mesh((n,), ("x",))


def test_ring_all_gather_matches_lax(mesh):
    n = mesh.shape["x"]
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 30, (n * 2, 4, 128)).astype(np.int32)
    xs = jax.device_put(
        jnp.asarray(x),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("x")))
    got = np.asarray(ring_all_gather(xs, mesh, interpret=True))
    np.testing.assert_array_equal(got, x)


def test_ring_all_gather_float(mesh):
    n = mesh.shape["x"]
    x = np.arange(n * 8 * 128, dtype=np.float32).reshape(n, 8, 128)
    xs = jax.device_put(
        jnp.asarray(x),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("x")))
    got = np.asarray(ring_all_gather(xs, mesh, interpret=True))
    np.testing.assert_array_equal(got.reshape(n, 8, 128), x)


def test_ring_histogram_reduce_matches_psum(mesh):
    """The overlapped ring all-reduce must equal the XLA psum path used
    by shared-table mode — on real per-shard byte histograms."""
    n = mesh.shape["x"]
    data = gen_sequence(0.2, n * 4096).reshape(n, 4096)
    counts = np.stack([np.bincount(d, minlength=256) for d in data])
    total = ring_all_reduce_histograms(counts, mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(total),
                                  counts.sum(axis=0).astype(np.int32))


def test_ring_single_device_passthrough():
    mesh1 = jax.make_mesh((1,), ("x",), devices=jax.devices()[:1])
    c = np.arange(256, dtype=np.int32)[None]
    np.testing.assert_array_equal(
        np.asarray(ring_all_reduce_histograms(c, mesh1, interpret=True)),
        c[0])
