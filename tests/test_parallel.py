"""Multi-device (8 virtual CPU devices) sharded compress/decompress."""

import jax
import numpy as np
import pytest

from entropy_coders_tpu import frame as F
from entropy_coders_tpu import parallel

from conftest import gen_sequence


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect 8 virtual devices"
    return parallel.default_mesh()


def test_sharded_roundtrip(mesh):
    data = gen_sequence(0.2, 1 << 16)
    comp = parallel.compress(data, mesh, block_size=1 << 12, k=32)
    out = parallel.decompress(comp, mesh)
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)


def test_sharded_matches_unsharded(mesh):
    data = gen_sequence(0.3, 1 << 15)
    sharded = parallel.compress(data, mesh, block_size=1 << 12, k=16)
    local = F.compress(data, block_size=1 << 12, k=16)
    assert sharded == local  # sharding must not change the bytes


def test_sharded_uneven_blocks(mesh):
    # 5 blocks over 8 devices: exercises batch padding
    data = gen_sequence(0.2, 5 * (1 << 12) + 123)
    comp = parallel.compress(data, mesh, block_size=1 << 12, k=16)
    out = parallel.decompress(comp, mesh)
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)


def test_sharded_shared_table(mesh):
    data = gen_sequence(0.2, 1 << 15)
    comp = parallel.compress(data, mesh, block_size=1 << 12, k=16,
                             shared_table=True)
    out = parallel.decompress(comp, mesh)
    np.testing.assert_array_equal(np.frombuffer(out, np.uint8), data)


def test_sharded_histogram_allreduce(mesh):
    data = gen_sequence(0.2, 1 << 14)
    blocks = data.reshape(8, -1)
    counts = np.asarray(parallel.sharded_histogram(blocks, mesh))
    np.testing.assert_array_equal(counts, np.bincount(data, minlength=256))
