#!/usr/bin/env python3
"""Freeze the full-fidelity bench map into an immutable round artifact.

The driver's BENCH_rNN.json keeps only a bounded tail of Bench's stdout;
graft.Bench therefore prints a COMPACT line (q-number keys, 2-decimal
seconds) that fits the tail, and writes the full-name full-precision map
to the mutable BENCH_LOCAL.json. This script copies that map to
BENCH_r{N}_full.json (validated, pretty-printed, refused if the target
already exists) so each round's complete per-query timings survive
later re-runs of the bench.

Usage: python3 tools/snapshot_bench.py <round-number>
"""
import json
import pathlib
import sys


def main() -> int:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print(__doc__, file=sys.stderr)
        return 2
    repo = pathlib.Path(__file__).resolve().parent.parent
    src = repo / "BENCH_LOCAL.json"
    dst = repo / f"BENCH_r{int(sys.argv[1])}_full.json"
    if dst.exists():
        print(f"refusing to overwrite immutable artifact {dst.name}", file=sys.stderr)
        return 1
    data = json.loads(src.read_text())
    for field in ("metric", "value", "queries", "sf"):
        if field not in data:
            print(f"{src.name} is missing required field {field!r}", file=sys.stderr)
            return 1
    nulls = sorted(k for k, v in data["queries"].items() if v is None)
    if nulls:
        print(f"warning: {len(nulls)} queries have null timings: {', '.join(nulls)}",
              file=sys.stderr)
    dst.write_text(json.dumps(data, indent=1, sort_keys=True) + "\n")
    print(f"wrote {dst.name}: {len(data['queries'])} queries, "
          f"total {data['value']:.1f}s at {data['sf']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
