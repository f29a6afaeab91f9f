"""Command-line interface: file compression with the TPU container format.

Usage:
    python -m entropy_coders_tpu compress   <in> <out> [--block-size N]
        [--k N] [--table-log N] [--shared-table] [--no-lanes]
    python -m entropy_coders_tpu decompress <in> <out>
    python -m entropy_coders_tpu stat       <in>

The reference is a library only; this CLI is the framework's end-to-end
driver for real files (and doubles as a smoke test on any backend — on
non-TPU backends the Pallas kernels run in interpreter mode via the XLA
fallback paths).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="entropy_coders_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compress")
    c.add_argument("infile")
    c.add_argument("outfile")
    c.add_argument("--block-size", type=int, default=None)
    c.add_argument("--k", type=int, default=None)
    c.add_argument("--table-log", type=int, default=None)
    c.add_argument("--shared-table", action="store_true")
    c.add_argument("--no-lanes", action="store_true")
    c.add_argument("--checksum", action="store_true")
    c.add_argument("--bit-pack", action="store_true",
                   help="bit-pack lane streams (FLAG_PACKED; smaller, "
                        "slower host repack)")

    d = sub.add_parser("decompress")
    d.add_argument("infile")
    d.add_argument("outfile")

    s = sub.add_parser("stat")
    s.add_argument("infile")

    args = p.parse_args(argv)

    import os
    plat = os.environ.get("ECT_PLATFORM")
    if plat:  # authoritative backend override (some environments pin
        # JAX_PLATFORMS via plugin hooks that ignore the env var)
        import jax
        jax.config.update("jax_platforms", plat)

    from . import frame as F

    if args.cmd == "compress":
        data = open(args.infile, "rb").read()
        kw = {}
        if args.block_size:
            kw["block_size"] = args.block_size
        if args.k:
            kw["k"] = args.k
        if args.table_log:
            kw["table_log"] = args.table_log
        if args.shared_table:
            kw["shared_table"] = True
        if args.no_lanes:
            kw["lanes"] = False
        if args.checksum:
            kw["checksum"] = True
        if args.bit_pack:
            kw["bit_pack"] = True
        t0 = time.perf_counter()
        comp = F.compress(data, **kw)
        dt = time.perf_counter() - t0
        open(args.outfile, "wb").write(comp)
        print(f"{len(data)} -> {len(comp)} bytes "
              f"(ratio {len(comp)/max(len(data),1):.4f}) in {dt:.2f}s",
              file=sys.stderr)
    elif args.cmd == "decompress":
        comp = open(args.infile, "rb").read()
        t0 = time.perf_counter()
        data = F.decompress(comp)
        dt = time.perf_counter() - t0
        open(args.outfile, "wb").write(data)
        print(f"{len(comp)} -> {len(data)} bytes in {dt:.2f}s",
              file=sys.stderr)
    else:
        from .utils import frame_stats

        st = frame_stats(open(args.infile, "rb").read())
        print(f"blocks={st.n_blocks} block_size={st.block_size} k={st.k} "
              f"shared={st.shared_table} modes={st.mode_counts}")
        print(f"ratio={st.ratio:.4f} header_bytes={st.header_bytes} "
              f"lane_tables={st.lane_size_table_bytes} "
              f"overhead={st.overhead:.4%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
