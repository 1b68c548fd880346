#!/usr/bin/env python3
"""Merge N `storeonly` stress passes into a committed tier artifact.

The `bm25_store`/`lsh_store` sections (r16) were added after the
committed multi-pass tier campaigns froze, so they run standalone
(`runMain graft.Stress <copies> storeonly`, one {"metric":
"stress_store"} line per pass) instead of invalidating the committed
same-revision passes — the same convention as `ivf_dml_patch`/
`ivf_pq`. Every pass rebuilds both stores from scratch, so ALL fields
are independent measurements: build/probe/pairs/direct/update fields
take the per-field MEDIAN across passes (min/max and raw per-pass
lists alongside); *_first_sec fields keep the min (JIT warm-in floor).

All contributing passes must share one engine revision (or prove
engine-identity via `git diff --quiet rA rB -- src/main build.sbt
project`) and match the tier's copies.

Usage: python3 tools/merge_store.py TIER.json PASS1.json [PASS2 ...]
"""
import json
import subprocess
import sys

SECTIONS = ("bm25_store", "lsh_store")
MEDIANED = ("build_sec", "probe_sec", "pairs_sec", "direct_sec", "update_sec")
ONETIME = ("probe_first_sec", "pairs_first_sec")


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
        if p.get("metric") != "stress_store":
            print(f"not a storeonly pass: metric={p.get('metric')}", file=sys.stderr)
            return 1
        if (p["copies"], p["base"]) != (tier["copies"], tier["base"]):
            print("refusing to merge a store pass from a different tier",
                  file=sys.stderr)
            return 1
        if not all(p[s].get("match") for s in SECTIONS):
            print("refusing a pass whose store/direct outputs diverged",
                  file=sys.stderr)
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
    for sec in SECTIONS:
        secs = [p[sec] for p in passes]
        base = dict(sorted(
            secs, key=lambda s: s.get("probe_sec", s.get("pairs_sec", 0)))[len(secs) // 2])
        for f in MEDIANED:
            vals = [s[f] for s in secs if f in s]
            if vals:
                base[f] = median(vals)
                base[f + "_min"] = min(vals)
                base[f + "_max"] = max(vals)
                base[f + "_per_pass"] = vals
        for f in ONETIME:
            vals = [s[f] for s in secs if f in s]
            if vals:
                base[f] = min(vals)
        base["passes"] = len(secs)
        base["revision"] = revisions[0]
        base["note"] = ("section added after the tier campaign froze; "
                        "measured standalone (storeonly mode) at the recorded "
                        "revision, which differs from the surrounding "
                        "sections' revision")
        tier[sec] = base
    with open(tier_path, "w") as f:
        json.dump(tier, f, indent=1)
        f.write("\n")
    b, l = tier["bm25_store"], tier["lsh_store"]
    print(f"merged {len(passes)} store passes into {tier_path}: "
          f"bm25 build={b['build_sec']} probe={b['probe_sec']} "
          f"direct={b['direct_sec']} update={b['update_sec']} | "
          f"lsh build={l['build_sec']} pairs={l['pairs_sec']} "
          f"direct={l['direct_sec']} update={l['update_sec']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
