#!/usr/bin/env python3
"""Merge N `q111only` stress passes into a committed tier artifact.

r17 salted q111's hot-gram join (the r16 committed 100x row swung
7.2-21.8 s across same-revision passes), so the row is re-measured
standalone (`runMain graft.Stress <copies> q111only`, one
{"metric":"stress_q111"} line per pass) at the salted revision and
REPLACES the tier's queries.q111_substring_dedup entry — with the
section's own revision disclosed, per the post-campaign convention
(the surrounding queries keep the original campaign's revision).

steady_sec takes the per-pass MEDIAN (min/max and the raw list
alongside); first_sec keeps the min. All contributing passes must
share one engine revision (or prove engine-identity via
`git diff --quiet rA rB -- src/main build.sbt project`).

Usage: python3 tools/merge_q111.py TIER.json PASS1.json [PASS2 ...]
"""
import json
import subprocess
import sys

KEY = "q111_substring_dedup"


def median(vals):
    vs = sorted(vals)
    n = len(vs)
    return vs[n // 2] if n % 2 else round((vs[n // 2 - 1] + vs[n // 2]) / 2, 3)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    tier_path = sys.argv[1]
    tier = json.load(open(tier_path))
    passes = [json.load(open(p)) for p in sys.argv[2:]]
    for p in passes:
        if p.get("metric") != "stress_q111":
            print(f"not a q111only pass: metric={p.get('metric')}", file=sys.stderr)
            return 1
        if (p["copies"], p["base"]) != (tier["copies"], tier["base"]):
            print("refusing a q111 pass from a different tier", file=sys.stderr)
            return 1
    revisions = [p.get("revision") for p in passes]
    if None in revisions:
        print("refusing passes of unknown revisions", file=sys.stderr)
        return 1
    distinct = list(dict.fromkeys(revisions))
    for a, b in zip(distinct, distinct[1:]):
        same = subprocess.run(
            ["git", "diff", "--quiet", a, b, "--",
             "src/main", "build.sbt", "project"],
            capture_output=True).returncode
        if same != 0:
            print(f"refusing different ENGINES: {a} vs {b} differ under "
                  "src/main/build.sbt/project", file=sys.stderr)
            return 1
    steadies = [p[KEY]["steady_sec"] for p in passes]
    firsts = [p[KEY]["first_sec"] for p in passes]
    tier["queries"][KEY] = {
        "first_sec": min(firsts),
        "steady_sec": median(steadies),
        "steady_min_sec": min(steadies),
        "steady_max_sec": max(steadies),
        "steady_per_pass": steadies,
        "passes": len(passes),
        "revision": revisions[0],
        "note": ("re-measured standalone (q111only mode) at the salted-join "
                 "revision, which differs from the surrounding queries' "
                 "campaign revision"),
    }
    # storm-aware passes (r19) carry per-repeat timings, per-repeat sys%
    # and the discard count — keep them for adjudication when present
    for extra, field in (("steady_repeats", "steady_repeats_per_pass"),
                         ("pass_sys_pct", "pass_sys_pct_per_pass"),
                         ("storm_discarded", "storm_discarded_per_pass")):
        vals = [p[KEY].get(extra) for p in passes]
        if any(v is not None for v in vals):
            tier["queries"][KEY][field] = vals
    with open(tier_path, "w") as f:
        json.dump(tier, f, indent=1)
        f.write("\n")
    q = tier["queries"][KEY]
    print(f"merged {len(passes)} q111 passes into {tier_path}: "
          f"steady={q['steady_sec']} (band {q['steady_min_sec']}-"
          f"{q['steady_max_sec']}), first={q['first_sec']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
