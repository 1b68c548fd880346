#!/usr/bin/env python3
"""Sync README's advertised `sbt test` count with the suite's actual count.

The README quotes the test count in its quick-start line; every round
that adds a suite used to require remembering to bump it by hand (r12
shipped a stale 238 vs the real 272). This tool reads the count straight
from an `sbt test` log ("Total number of tests run: N") and rewrites the
README line, the way PLANS.md is regenerated from EXPLAIN output — the
number can no longer drift from the suite.

Usage:
  sbt -batch test | tee /tmp/sbt_test.log
  python3 tools/sync_test_count.py /tmp/sbt_test.log          # patch README
  python3 tools/sync_test_count.py /tmp/sbt_test.log --check  # assert only

Exit codes: 0 = in sync (or patched), 1 = drift found in --check mode,
2 = the log has no parseable count (the run died before the summary).
"""
import re
import sys


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    log = open(sys.argv[1], errors="replace").read()
    check_only = "--check" in sys.argv[2:]
    counts = re.findall(r"Total number of tests run: (\d+)", log)
    fails = re.findall(r"Tests: succeeded \d+, failed (\d+)", log)
    if not counts:
        print("no 'Total number of tests run' line in the log — "
              "did the run finish?", file=sys.stderr)
        return 2
    if any(int(f) != 0 for f in fails):
        print("refusing to sync from a log with test failures", file=sys.stderr)
        return 2
    n = counts[-1]
    readme = open("README.md").read()
    patched, subs = re.subn(r"`sbt test` \(\d+ tests\)",
                            f"`sbt test` ({n} tests)", readme)
    if subs == 0:
        print("README.md has no '`sbt test` (N tests)' line to sync",
              file=sys.stderr)
        return 2
    if patched == readme:
        print(f"README in sync: {n} tests")
        return 0
    if check_only:
        advertised = re.search(r"`sbt test` \((\d+) tests\)", readme).group(1)
        print(f"DRIFT: suite runs {n} tests but README advertises {advertised}",
              file=sys.stderr)
        return 1
    open("README.md", "w").write(patched)
    print(f"README updated to {n} tests")
    return 0


if __name__ == "__main__":
    sys.exit(main())
