#!/usr/bin/env python3
"""Merge N `dmlonly` stress passes into a committed tier artifact.

The `ivf_dml_patch` section was added after the round-15 tier campaign
froze, so it runs standalone (`runMain graft.Stress <copies> dmlonly`,
one {"metric":"stress_dml"} line per pass) instead of invalidating the
committed same-revision multi-pass artifacts. This tool folds the dml
passes into the tier artifact under the `ivf_dml_patch` key with the
campaign's own conventions — patch_sec/probe_sec take the per-field
MEDIAN across passes (min/max and the raw per-pass list alongside;
each pass restages the corpus+index from scratch, so every pass is an
independent measurement), build_sec keeps the min (one-time staging
floor) — plus the dml passes' git revision, disclosed separately
because it is NOT the revision the surrounding sections ran at.

All contributing dml passes must share one engine revision (or prove
engine-identity via `git diff --quiet rA rB -- src/main build.sbt
project`, same rule as merge_stress.py) and match the tier's copies.

Usage: python3 tools/merge_dml.py TIER.json DMLPASS1.json [DMLPASS2 ...]
"""
import json
import subprocess
import sys

STEADY = ("patch_sec", "probe_sec")
ONETIME = ("build_sec", "probe_first_sec")


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
        if p.get("metric") != "stress_dml":
            print(f"not a dmlonly pass: metric={p.get('metric')}", file=sys.stderr)
            return 1
        if (p["copies"], p["base"]) != (tier["copies"], tier["base"]):
            print("refusing to merge a dml pass from a different tier",
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
    secs = [p["ivf_dml_patch"] for p in passes]
    base = dict(sorted(secs, key=lambda s: s["patch_sec"])[len(secs) // 2])
    for f in STEADY:
        vals = [s[f] for s in secs if f in s]
        if vals:
            base[f] = median(vals)
            base[f + "_min"] = min(vals)
            base[f + "_max"] = max(vals)
    for f in ONETIME:
        vals = [s[f] for s in secs if f in s]
        if vals:
            base[f] = min(vals)
    base["patch_sec_per_pass"] = [s["patch_sec"] for s in secs]
    base["passes"] = len(secs)
    base["revision"] = revisions[0]
    base["note"] = ("section added after the tier campaign froze; measured "
                    "standalone (dmlonly mode) at the recorded revision, "
                    "which differs from the surrounding sections' revision")
    tier["ivf_dml_patch"] = base
    with open(tier_path, "w") as f:
        json.dump(tier, f, indent=1)
        f.write("\n")
    print(f"merged {len(secs)} dml passes into {tier_path}: "
          f"patch_sec={base['patch_sec']} "
          f"[{base.get('patch_sec_min')}-{base.get('patch_sec_max')}] "
          f"build_sec={base['build_sec']} recall@5={base.get('recall_at5')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
