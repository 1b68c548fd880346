#!/usr/bin/env python3
"""Merge N `streamonly` stress passes into a committed tier artifact.

The `bm25_stream` section (r17, q132's composition at tier scale) was
added after the committed multi-pass tier campaigns froze, so it runs
standalone (`runMain graft.Stress <copies> streamonly`, one
{"metric":"stress_stream"} line per pass) — the same convention as
ivf_dml_patch / ivf_pq / bm25_store. Every pass restages the feed and
rebuilds the seed index from scratch, so all fields are independent:
drain/direct take the per-field MEDIAN across passes (min/max and raw
lists alongside); seed_build_sec keeps the min; batch_secs keeps the
per-pass arrays verbatim (the flatness ACROSS TIERS of these per-batch
costs is the section's claim).

Usage: python3 tools/merge_stream.py TIER.json PASS1.json [PASS2 ...]
"""
import json
import subprocess
import sys

KEYS = ("bm25_stream", "ivf_stream")


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
        if p.get("metric") != "stress_stream":
            print(f"not a streamonly pass: metric={p.get('metric')}", file=sys.stderr)
            return 1
        if (p["copies"], p["base"]) != (tier["copies"], tier["base"]):
            print("refusing a stream pass from a different tier", file=sys.stderr)
            return 1
        if not all(p[k].get("match") for k in KEYS if k in p):
            print("refusing a pass whose maintained index diverged from its "
                  "reference pipeline", file=sys.stderr)
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
    for key in KEYS:
        secs = [p[key] for p in passes if key in p]
        if not secs:
            continue
        base = dict(sorted(secs, key=lambda s: s["drain_sec"])[len(secs) // 2])
        for f in ("drain_sec", "direct_sec", "onebatch_sec"):
            vals = [s[f] for s in secs if f in s]
            if not vals:
                continue
            base[f] = median(vals)
            base[f + "_min"] = min(vals)
            base[f + "_max"] = max(vals)
            base[f + "_per_pass"] = vals
        base["seed_build_sec"] = min(s["seed_build_sec"] for s in secs)
        base["batch_secs_per_pass"] = [s["batch_secs"] for s in secs]
        base["passes"] = len(secs)
        base["revision"] = revisions[0]
        base["note"] = ("section added after the tier campaign froze; measured "
                        "standalone (streamonly mode) at the recorded revision")
        tier[key] = base
        print(f"merged {len(secs)} {key} passes into {tier_path}: "
              f"seed_build={base['seed_build_sec']} drain={base['drain_sec']} "
              f"batches={base['batch_secs_per_pass']}")
    with open(tier_path, "w") as f:
        json.dump(tier, f, indent=1)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
