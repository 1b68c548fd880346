#!/usr/bin/env python3
"""Merge N `pqonly` stress passes into a committed tier artifact.

The `ivf_pq` section (r16) was added after the committed multi-pass
tier campaigns froze, so it runs standalone (`runMain graft.Stress
<copies> pqonly`, one {"metric":"stress_pq"} line per pass) instead of
invalidating the committed same-revision passes — the same convention
as `ivf_dml_patch`/merge_dml.py. Every pass rebuilds the in-session
index and PQ encode from scratch, so ALL fields are independent
measurements: steady/encode/build fields take the per-field MEDIAN
across passes (min/max and the raw per-pass lists alongside);
probe_first_sec keeps the min (JIT warm-in floor).

All contributing passes must share one engine revision (or prove
engine-identity via `git diff --quiet rA rB -- src/main build.sbt
project`) and match the tier's copies.

Usage: python3 tools/merge_pq.py TIER.json PQPASS1.json [PQPASS2 ...]
"""
import json
import subprocess
import sys

MEDIANED = ("probe_sec", "encode_sec", "ivf_build_sec")
PER_PASS = ("probe_sec", "encode_sec")
ONETIME = ("probe_first_sec",)


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
        if p.get("metric") != "stress_pq":
            print(f"not a pqonly pass: metric={p.get('metric')}", file=sys.stderr)
            return 1
        if (p["copies"], p["base"]) != (tier["copies"], tier["base"]):
            print("refusing to merge a pq pass from a different tier",
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
    secs = [p["ivf_pq"] for p in passes]
    base = dict(sorted(secs, key=lambda s: s["probe_sec"])[len(secs) // 2])
    for f in MEDIANED:
        vals = [s[f] for s in secs if f in s]
        if vals:
            base[f] = median(vals)
            base[f + "_min"] = min(vals)
            base[f + "_max"] = max(vals)
    for f in ONETIME:
        vals = [s[f] for s in secs if f in s]
        if vals:
            base[f] = min(vals)
    for f in PER_PASS:
        base[f + "_per_pass"] = [s[f] for s in secs if f in s]
    base["passes"] = len(secs)
    base["revision"] = revisions[0]
    base["note"] = ("section added after the tier campaign froze; measured "
                    "standalone (pqonly mode) at the recorded revision, "
                    "which differs from the surrounding sections' revision")
    tier["ivf_pq"] = base
    with open(tier_path, "w") as f:
        json.dump(tier, f, indent=1)
        f.write("\n")
    print(f"merged {len(secs)} pq passes into {tier_path}: "
          f"probe_sec={base['probe_sec']} "
          f"[{base.get('probe_sec_min')}-{base.get('probe_sec_max')}] "
          f"encode_sec={base['encode_sec']} recall@5={base.get('recall_at5')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
