"""Build hook: pre-compile the native host codec during wheel builds.

The package works without this step — ``entropy_coders_tpu.native``
builds ``libfse_native.so`` lazily with g++ on first use (and degrades
to the vectorized numpy fallbacks when no toolchain exists) — but a
wheel built on a machine with g++ ships the .so so installs are ready
to run immediately. Metadata lives in pyproject.toml.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNative(build_py):
    def run(self):
        src_dir = Path(__file__).parent / "entropy_coders_tpu" / "native"
        try:
            import os

            env = dict(os.environ, ECT_NATIVE_PORTABLE="1")
            out = subprocess.run(
                [sys.executable, "build.py"], cwd=src_dir, env=env,
                capture_output=True, text=True, timeout=300,
            )
            if out.returncode != 0:
                print(f"native codec prebuild skipped: {out.stderr.strip()}",
                      file=sys.stderr)
        except Exception as e:  # no g++ etc. — runtime lazy build takes over
            print(f"native codec prebuild skipped: {e}", file=sys.stderr)
        super().run()


setup(cmdclass={"build_py": BuildPyWithNative})
