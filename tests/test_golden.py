"""Golden-vector regression tests.

The frames under tests/data/golden/ are fixed bytes produced by the
verified implementation (see tests/data/generate_golden.py). They pin the
on-the-wire format: a semantic regression in any ONE implementation
(spec, native C++, device ops/frame) fails here even if the other oracle
drifted with it — exactly the protection the two same-author oracles
cannot give each other. Reference format: src/lib.rs:112-183 (k-way
streams), src/histogram.rs:342-431 (header), FORMAT.md (container)."""

import hashlib
import json
import os

import numpy as np
import pytest

import entropy_coders_tpu as ect
from entropy_coders_tpu import frame as F
from entropy_coders_tpu import native

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "generate_golden",
    os.path.join(os.path.dirname(__file__), "data", "generate_golden.py"))
_gg = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_gg)
CASES, build_case = _gg.CASES, _gg.build_case
make_input, make_mixed = _gg.make_input, _gg.make_mixed

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "golden")

with open(os.path.join(GOLDEN, "manifest.json")) as f:
    MANIFEST = {e["name"]: e for e in json.load(f)}


def _case_data(case):
    spec = case["input"]
    if spec["kind"] == "mixed_rle_raw":
        return make_mixed(spec["size"], spec["seed"])
    return make_input(spec)


def _golden_bytes(name):
    with open(os.path.join(GOLDEN, MANIFEST[name]["file"]), "rb") as f:
        frame = f.read()
    assert hashlib.sha256(frame).hexdigest() == MANIFEST[name]["sha256"], \
        "golden file corrupted on disk"
    return frame


def test_manifest_covers_cases():
    assert set(MANIFEST) == {c["name"] for c in CASES}


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["name"])
def test_compress_matches_golden(case):
    """Today's compressor reproduces the pinned bytes exactly."""
    assert build_case(case) == _golden_bytes(case["name"])


@pytest.mark.parametrize(
    "case", [c for c in CASES if c["codec"] == "stream"],
    ids=lambda c: c["name"])
def test_stream_golden_decodes_spec_and_native(case):
    data = _case_data(case)
    frame = _golden_bytes(case["name"])
    out = bytearray()
    assert ect.fse_decompress(frame, out, k=case["k"]) == len(data)
    assert bytes(out) == data.tobytes()
    if native.available():
        assert native.decompress(frame, k=case["k"]) == data.tobytes()


@pytest.mark.parametrize(
    "case", [c for c in CASES if c["codec"] == "stream"],
    ids=lambda c: c["name"])
def test_stream_golden_compress_native(case):
    """The native C++ encoder produces the same pinned bytes (explicit
    table_log cases pass it through; the rest use its optimal_log2)."""
    if not native.available():
        pytest.skip("native module unavailable")
    data = _case_data(case)
    assert native.compress(data.tobytes(), k=case["k"],
                           table_log=case.get("table_log")) == \
        _golden_bytes(case["name"])


@pytest.mark.parametrize(
    "case", [c for c in CASES if c["codec"] == "frame"],
    ids=lambda c: c["name"])
def test_frame_golden_roundtrip(case):
    """The container decoder (device ops underneath) recovers the input
    from the pinned frame bytes."""
    data = _case_data(case)
    out = F.decompress(_golden_bytes(case["name"]), interpret=True)
    assert out == data.tobytes()


# --- checkpoint container (checkpoint.py, FSCK format) ----------------------


def _ckpt_case():
    return next(c for c in CASES if c["codec"] == "checkpoint")


def _assert_tree_equal(a, b, path="<root>"):
    if a is None:
        assert b is None, path
        return
    if isinstance(a, dict):
        assert sorted(a) == sorted(b), path
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert type(a) is type(b) and len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_tree_equal(x, y, f"{path}/{i}")
    else:
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype and a.shape == b.shape, path
        assert np.array_equal(a, b), path


def test_ckpt_golden_loads(tmp_path):
    """Today's loader restores the pinned checkpoint to the exact tree
    (full load AND per-leaf random access) — a reader-side format drift
    fails here even if save/load drifted together."""
    from entropy_coders_tpu import checkpoint as CK

    case = _ckpt_case()
    p = tmp_path / "golden.fsck"
    p.write_bytes(_golden_bytes(case["name"]))
    tree = _gg.make_ckpt_tree(case["input"]["seed"])
    _assert_tree_equal(tree, CK.load_pytree(p))
    with CK.Checkpoint(p) as ck:
        assert "params/w" in ck.leaf_paths
        np.testing.assert_array_equal(ck.load_leaf("params/w"),
                                      tree["params"]["w"])


def test_ckpt_golden_manifest_fuzz(tmp_path, rng):
    """Byte corruption anywhere in the FSCK header or manifest region
    never escapes the error contract: the loader either raises
    ValueError/KeyError or returns a well-formed tree (possibly
    different data — the manifest is not CRC-guarded; the frame payload
    is, separately). No TypeError/IndexError/segfault from numpy or
    json internals ever leaks (checkpoint._restore_leaf wraps them)."""
    from entropy_coders_tpu import checkpoint as CK

    case = _ckpt_case()
    blob = bytearray(_golden_bytes(case["name"]))
    (mlen,) = np.frombuffer(blob[8:12], "<u4")
    region = 12 + int(mlen)  # header + manifest
    tree = _gg.make_ckpt_tree(case["input"]["seed"])
    p = tmp_path / "fuzz.fsck"
    for pos in sorted(rng.choice(region, size=min(region, 48),
                                 replace=False)):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(blob)
            mut[pos] ^= flip
            p.write_bytes(mut)
            try:
                out = CK.load_pytree(p)
            except (ValueError, KeyError):
                continue  # the corruption contract
            # returned a tree: must be traversable; identical content is
            # fine (the flip landed in a semantically-inert byte, e.g. a
            # leaf path string — load() restores by skeleton indices)
            try:
                _assert_tree_equal(tree, out)
            except AssertionError:
                pass  # different data, well-formed — acceptable
