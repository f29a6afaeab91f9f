"""On-TPU smoke test: golden bit-exactness on REAL Mosaic kernels.

The pytest suite pins the CPU backend (tests/conftest.py) and runs every
Pallas kernel in interpreter mode, so a Mosaic lowering/numeric/layout
regression on the real chip would not fail any test — this module is the
driver-runnable gap-closer:

    python -m tests.tpu_smoke          # full: all golden frame cases
    python -m tests.tpu_smoke --quick  # first golden case + big block

It runs on whatever chip ``jax.devices()`` provides (exits 2 if the
backend is not TPU — interpreter mode would test nothing new) and
asserts, with interpret=False:

  1. every checked-in golden container frame (tests/data/golden/,
     MODE_FSE_PL lanes wire + FLAG_PACKED variants) is reproduced
     byte-for-byte by the real encode kernels, and decodes back to its
     pinned input through the real decode kernels;
  2. a 512 KiB k=8192 block (the non-fused kernel shape family) round
     trips and matches the interpret=True bytes exactly.

Exit 0 = no Mosaic regression detectable at these shapes.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from entropy_coders_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/jax_bench_cache")


def main(argv=None) -> int:
    quick = "--quick" in (argv or sys.argv[1:])
    import jax

    if jax.default_backend() != "tpu":
        print(f"tpu_smoke: backend is {jax.default_backend()!r}, not tpu — "
              "nothing to smoke-test (pytest already covers interpret mode)",
              file=sys.stderr)
        return 2

    import numpy as np

    from tests.data import generate_golden as GG
    from entropy_coders_tpu import frame as F

    golden_dir = os.path.join(os.path.dirname(__file__), "data", "golden")
    import json

    with open(os.path.join(golden_dir, "manifest.json")) as f:
        manifest = {e["name"]: e for e in json.load(f)}

    cases = [c for c in GG.CASES if c["codec"] == "frame"]
    if quick:
        cases = cases[:1]
    failures = []
    for case in cases:
        name = case["name"]
        t0 = time.perf_counter()
        spec = case["input"]
        data = (GG.make_mixed(spec["size"], spec["seed"])
                if spec["kind"] == "mixed_rle_raw" else GG.make_input(spec))
        with open(os.path.join(golden_dir, manifest[name]["file"]), "rb") as f:
            golden = f.read()
        built = GG.build_case(case)  # interpret=False on this backend
        if built != golden:
            failures.append(f"{name}: real-kernel compress bytes != golden")
        out = F.decompress(golden)
        if out != data.tobytes():
            failures.append(f"{name}: real-kernel decompress != input")
        print(f"  {name}: {'FAIL' if failures and failures[-1].startswith(name) else 'ok'}"
              f" ({time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    # non-fused big-block shape family: real kernels vs interpreter bytes
    t0 = time.perf_counter()
    data = GG.gen_sequence(0.2, (512 << 10) + 321, 77)
    kwargs = dict(block_size=512 << 10, k=8192, lanes=True)
    real = F.compress(data, **kwargs)
    interp = F.compress(data, interpret=True, **kwargs)
    if real != interp:
        failures.append("big-block: real-kernel bytes != interpreter bytes")
    if F.decompress(real) != data.tobytes():
        failures.append("big-block: real-kernel round trip failed")
    print(f"  big-block k=8192: {'FAIL' if failures and failures[-1].startswith('big-block') else 'ok'}"
          f" ({time.perf_counter() - t0:.1f}s)", file=sys.stderr)

    if failures:
        print("TPU_SMOKE FAIL\n" + "\n".join(failures))
        return 1
    print("TPU_SMOKE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
