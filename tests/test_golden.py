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
