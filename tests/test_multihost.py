"""Multi-host runtime test: two REAL JAX processes (CPU backend, gloo
collectives) compress/decompress through parallel.multihost and must
produce the byte-identical frame a single process makes.

This exercises the actual jax.distributed + multihost_utils code path —
not a simulation — covering: per-process owned-block compression, the
two-round DCN byte allgather, ordered frame assembly, assembled and
host-sharded decompression."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num: int, extra_args=()):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers use 1 CPU device each
    env["JAX_PLATFORMS"] = "cpu"
    last = None
    for attempt in range(3):  # _free_port is racy (TOCTOU); retry
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, str(port), str(num), str(i),
                 *map(str, extra_args)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env=env, text=True)
            for i in range(num)
        ]
        outs, rcs = [], []
        for p in procs:
            try:
                out, err = p.communicate(timeout=540)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append((out, err))
            rcs.append(p.returncode)
        if all(rc == 0 for rc in rcs):
            break
        last = outs
    else:
        raise AssertionError(f"workers failed 3 attempts:\n{last}")
    hashes = {line.split()[1] for o, _ in outs for line in o.splitlines()
              if line.startswith("OK")}
    assert len(hashes) == 1, f"hosts disagree on the frame: {outs}"


def test_two_process_roundtrip():
    _run_workers(2)


def test_four_process_uneven_ownership():
    """4 real processes over 3 blocks: ownership i*3//4 gives process 0
    ZERO blocks and the rest one each — the merge must skip the empty
    sub-frame and still produce single-process-identical bytes (quick
    leg set: global + shared-table frames)."""
    _run_workers(4, extra_args=(3,))
