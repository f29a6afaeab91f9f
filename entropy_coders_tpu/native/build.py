"""Build the native host codec shared library with g++.

Usage: ``python -m entropy_coders_tpu.native.build`` (or it builds lazily
on first import of ``entropy_coders_tpu.native``).
"""

from __future__ import annotations

import subprocess
from pathlib import Path

SRC = Path(__file__).parent / "fse_native.cpp"
LIB = Path(__file__).parent / "libfse_native.so"


def build(force: bool = False) -> Path:
    if LIB.exists() and not force:
        if LIB.stat().st_mtime >= SRC.stat().st_mtime:
            return LIB
    # -march=native for the default lazy build (runs on the machine that
    # compiled it). Wheel builds set ECT_NATIVE_PORTABLE=1: a native .so
    # shipped to an older CPU loads fine under dlopen and then dies with
    # SIGILL at the first unsupported instruction — no -march there.
    import os

    arch = [] if os.environ.get("ECT_NATIVE_PORTABLE") else ["-march=native"]
    cmd = [
        "g++", "-O3", *arch, "-std=c++17", "-shared", "-fPIC",
        "-fopenmp", "-o", str(LIB), str(SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError:
        # toolchains without libgomp: the pragmas degrade to serial code
        cmd.remove("-fopenmp")
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
