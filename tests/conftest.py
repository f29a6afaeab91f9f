"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path, and benches run on the real chip).
"""

import os

# Must be set before jax is imported anywhere. Force CPU: the ambient
# environment may pre-set JAX_PLATFORMS to the real TPU (axon), but the
# test suite needs 8 virtual devices and fast compiles; the bench and the
# driver's dryrun exercise the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; the config
# update is authoritative as long as it runs before first backend use.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite compiles many (shape, k, log2)
# variants of the scan kernels; cache them across runs. Env vars are NOT
# enough here — this sandbox preloads jax before conftest runs, so
# JAX_COMPILATION_CACHE_DIR set now would silently no-op; the helper
# applies jax.config.update, which works regardless (utils/cache.py).
from entropy_coders_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/jax_test_cache", min_compile_secs=0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xF5E)


def gen_sequence(prob: float, size: int, seed: int = 0xF5E) -> np.ndarray:
    """Synthetic approximately-geometric byte sequence, replicating the
    reference's test-data generator (reference: src/lib.rs:255-278) but
    seeded for determinism."""
    LUT_SIZE = 4096
    lut = np.zeros(LUT_SIZE, dtype=np.uint8)
    prob = min(max(prob, 0.005), 0.995)
    remaining = LUT_SIZE
    idx = 0
    s = 0
    while remaining > 0:
        n = max(int(remaining * prob), 1)
        lut[idx : idx + n] = s
        idx += n
        s = (s + 1) & 0xFF
        remaining -= n
    r = np.random.default_rng(seed)
    i = r.integers(0, 1 << 16, size=size, dtype=np.uint16)
    return lut[i & (LUT_SIZE - 1)]
