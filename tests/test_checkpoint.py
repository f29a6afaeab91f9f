"""Compressed pytree checkpoints (entropy_coders_tpu.checkpoint).

Round-trip, per-leaf random access, atomicity, and corruption contract.
"""

import json
import struct

import numpy as np
import pytest

from entropy_coders_tpu import checkpoint as C
from entropy_coders_tpu import frame as F


def _tree(rng):
    return {
        "params": {
            "dense": {
                "kernel": rng.normal(size=(64, 96)).astype(np.float32),
                "bias": np.zeros(96, np.float32),
            },
            "emb": (rng.integers(0, 255, (128, 32)).astype(np.uint8),
                    rng.normal(size=17).astype(np.float64)),
        },
        "step": np.asarray(12345, np.int64),
        "opt": [rng.normal(size=(8, 8)).astype(np.float32), None],
        "flags": np.array([True, False, True]),
    }


def _assert_tree_equal(a, b, path="<root>"):
    assert type(a) is type(b) or (
        isinstance(a, np.ndarray) and isinstance(b, np.ndarray)), path
    if a is None:
        return
    if isinstance(a, dict):
        assert sorted(a) == sorted(b), path
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}/{i}")
    else:
        a = np.asarray(a)
        assert a.dtype == b.dtype, path
        assert a.shape == b.shape, path
        assert np.array_equal(a, b), path


def test_round_trip(tmp_path, rng):
    tree = _tree(rng)
    p = tmp_path / "ck.fsck"
    n = C.save_pytree(p, tree, block_size=4096, k=16)
    assert n == p.stat().st_size
    out = C.load_pytree(p)
    _assert_tree_equal(tree, out)


def test_round_trip_bf16(tmp_path, rng):
    ml_dtypes = pytest.importorskip("ml_dtypes")
    tree = {"w": rng.normal(size=(32, 128)).astype(ml_dtypes.bfloat16)}
    p = tmp_path / "ck.fsck"
    C.save_pytree(p, tree, block_size=2048, k=16)
    out = C.load_pytree(p)
    assert out["w"].dtype == ml_dtypes.bfloat16
    assert np.array_equal(out["w"], tree["w"])


def test_jax_array_leaves(tmp_path, rng):
    import jax.numpy as jnp

    tree = {"a": jnp.arange(1000, dtype=jnp.int32),
            "b": jnp.ones((16, 16), jnp.float32) * 3}
    p = tmp_path / "ck.fsck"
    C.save_pytree(p, tree, block_size=2048, k=16)
    out = C.load_pytree(p)
    assert np.array_equal(out["a"], np.arange(1000, dtype=np.int32))
    assert np.array_equal(out["b"], np.full((16, 16), 3, np.float32))


def test_leaf_random_access(tmp_path, rng):
    tree = _tree(rng)
    p = tmp_path / "ck.fsck"
    # small blocks so leaves span several and ranges matter
    C.save_pytree(p, tree, block_size=1024, k=16)
    with C.Checkpoint(p) as ck:
        names = ck.leaf_paths
        assert "params/dense/kernel" in names
        got = ck.load_leaf("params/dense/kernel")
        assert np.array_equal(got, tree["params"]["dense"]["kernel"])
        got2 = ck.load_leaf("params/emb/1")
        assert np.array_equal(got2, tree["params"]["emb"][1])
        meta = ck.leaf_meta("step")
        assert meta["dtype"] == "int64" and meta["shape"] == []
        with pytest.raises(KeyError):
            ck.load_leaf("nope")
    sub = C.load_pytree(p, leaves=["step", "flags"])
    assert int(sub["step"]) == 12345
    assert np.array_equal(sub["flags"], tree["flags"])


def test_leaf_subset_matches_full(tmp_path, rng):
    tree = _tree(rng)
    p = tmp_path / "ck.fsck"
    C.save_pytree(p, tree, block_size=512, k=16, bit_pack=True,
                  checksum=True)
    full = C.load_pytree(p)
    with C.Checkpoint(p) as ck:
        for name in ck.leaf_paths:
            a = ck.load_leaf(name)
            # walk the full tree by path
            node = full
            for part in name.split("/"):
                node = node[int(part)] if isinstance(node, (list, tuple)) \
                    else node[part]
            assert np.array_equal(a, np.asarray(node)), name


def test_deterministic_bytes(tmp_path, rng):
    tree = _tree(rng)
    p1, p2 = tmp_path / "a.fsck", tmp_path / "b.fsck"
    # same tree with different dict insertion order -> identical file
    t2 = json.loads(json.dumps({"x": 0}))  # noop to keep rng aligned
    C.save_pytree(p1, tree, block_size=4096, k=16)
    reordered = {k: tree[k] for k in reversed(list(tree))}
    C.save_pytree(p2, reordered, block_size=4096, k=16)
    assert p1.read_bytes() == p2.read_bytes()


def test_empty_and_degenerate(tmp_path):
    p = tmp_path / "ck.fsck"
    C.save_pytree(p, {}, k=16)
    assert C.load_pytree(p) == {}
    C.save_pytree(p, None, k=16)
    assert C.load_pytree(p) is None
    C.save_pytree(p, {"z": np.zeros(0, np.float32)}, k=16)
    out = C.load_pytree(p)
    assert out["z"].shape == (0,) and out["z"].dtype == np.float32


def test_rejects_bad_trees(tmp_path):
    with pytest.raises(TypeError):
        C.save_pytree(tmp_path / "x", {1: np.zeros(3)})  # non-str key
    with pytest.raises(TypeError):
        C.save_pytree(tmp_path / "x", {"f": open})  # non-array leaf


def test_corruption_contract(tmp_path, rng):
    tree = _tree(rng)
    p = tmp_path / "ck.fsck"
    C.save_pytree(p, tree, block_size=1024, k=16, checksum=True)
    raw = bytearray(p.read_bytes())
    # bad magic
    bad = tmp_path / "bad.fsck"
    b2 = bytearray(raw)
    b2[0] ^= 0xFF
    bad.write_bytes(b2)
    with pytest.raises(ValueError):
        C.load_pytree(bad)
    # flip a payload byte: crc catches it on full load
    b3 = bytearray(raw)
    b3[-max(len(raw) // 3, 1)] ^= 0x55
    bad.write_bytes(b3)
    with pytest.raises(ValueError):
        C.load_pytree(bad)
    # truncated manifest
    bad.write_bytes(raw[:10])
    with pytest.raises(ValueError):
        C.load_pytree(bad)
    # original still loads (atomic writes never corrupted it)
    _assert_tree_equal(tree, C.load_pytree(p))


def test_failed_save_preserves_existing(tmp_path, rng, monkeypatch):
    tree = _tree(rng)
    p = tmp_path / "ck.fsck"
    C.save_pytree(p, tree, block_size=4096, k=16)
    before = p.read_bytes()
    with pytest.raises(TypeError):
        C.save_pytree(p, {"bad": object()})
    assert p.read_bytes() == before


def test_compression_wins_on_model_like_data(tmp_path, rng):
    # low-entropy leaves (quantized-ish weights) should compress well
    w = (rng.normal(size=(256, 256)) * 8).astype(np.int8)
    p = tmp_path / "ck.fsck"
    n = C.save_pytree(p, {"w": w}, block_size=F.DEFAULT_BLOCK_SIZE, k=64)
    assert n < w.nbytes * 0.8
