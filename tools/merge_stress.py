#!/usr/bin/env python3
"""Merge N heavy-tier stress passes into one committed artifact.

The 100x tier runs minutes per probe on a shared-host VM whose
throughput swings pass-to-pass far beyond the documented 15-30% noise
(observed: identical deterministic probes 1.2-4x apart between two
back-to-back passes). A single pass is therefore not a measurement;
the committed artifact's HEADLINE steady_sec is the MEDIAN across
passes (round 14 — the min headline understated q111's 2.1x per-pass
spread), with steady_min_sec / steady_max_sec and every pass's raw
steady time alongside so both the noise floor and the spread stay
visible. first_sec keeps the min (it measures a one-time build, where
the floor IS the quantity of interest).

Merging is only meaningful across passes of the SAME code: a per-field
min over different engine versions compares apples to oranges (the r12
artifact mixed pre- and post-pairs-cache passes, making q42's merged
steady_sec a warm-cache read ~40x below what the same field meant in
the other passes). Every pass JSON therefore carries the git revision
it ran at. Passes at DIFFERENT revisions merge only when git proves
the revisions carry an IDENTICAL engine (`git diff --quiet rA rB --
src/main` — i.e. only tests/docs/artifacts moved between them); the
merged artifact then records every contributing revision. Anything
else — including legacy passes without a revision field — is refused:
re-run them at HEAD.

Usage: python3 tools/merge_stress.py OUT PASS1.json PASS2.json [...]
"""
import json
import subprocess
import sys

# dict-valued sections merged field-by-field: steady-state timing fields
# take the per-field median across passes (min/max kept alongside);
# one-time-cost fields keep the min; non-timing fields (rows, recall,
# counts) come from the median-steady pass (deterministic per code version)
SECTIONS = ("semantic_dedup", "semantic_dedup_hier", "ivf_split",
            "ivf_persist", "ivf_incremental", "cdc_catchup", "ss_join")
# update_sec is re-measured per pass (ivf_incremental restages each
# pass), so it medians like a steady field rather than min-ing like a
# one-time build
STEADY_FIELDS = ("steady_sec", "probe_sec", "cold_probe_sec", "drain_sec",
                 "update_sec")
ONETIME_FIELDS = ("first_sec", "build_sec", "probe_first_sec")


def median(vals):
    vs = sorted(vals)
    n = len(vs)
    return vs[n // 2] if n % 2 else round((vs[n // 2 - 1] + vs[n // 2]) / 2, 3)


def merge_section(passes, key):
    sem = [p[key] for p in passes if key in p]
    if not sem:
        return None
    steady_key = next((f for f in ("steady_sec", "probe_sec", "cold_probe_sec",
                                   "drain_sec")
                       if f in sem[0]), None)
    base = dict(sorted(sem, key=lambda s: s[steady_key])[len(sem) // 2]
                if steady_key else sem[0])
    for f in STEADY_FIELDS:
        vals = [s[f] for s in sem if f in s]
        if vals:
            base[f] = median(vals)
            base[f + "_min"] = min(vals)
            base[f + "_max"] = max(vals)
    for f in ONETIME_FIELDS:
        vals = [s[f] for s in sem if f in s]
        if vals:
            base[f] = min(vals)
    # a one-time build cached across passes reports 0.0 on reuse passes;
    # the honest build cost is the min over passes that actually BUILT.
    # If NO merged pass built, the real cost is UNKNOWN — carry null, not
    # a fake 0.0 that silently drops the cost from the artifact.
    if "built" in base:
        built_vals = [s["build_sec"] for s in sem if s.get("built")]
        base["built"] = bool(built_vals)
        base["build_sec"] = min(built_vals) if built_vals else None
    if steady_key:
        base[steady_key + "_per_pass"] = [p.get(key, {}).get(steady_key)
                                          for p in passes]
    return base


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__, file=sys.stderr)
        return 2
    out, passes = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
    base = passes[0]
    for p in passes[1:]:
        if (p["copies"], p["base"], p.get("mode")) != (
                base["copies"], base["base"], base.get("mode")):
            print("refusing to merge passes of different tiers", file=sys.stderr)
            return 1
    revisions = [p.get("revision") for p in passes]
    if None in revisions:
        print(f"refusing to merge passes of unknown code revisions: "
              f"{revisions} — re-run every pass at one revision", file=sys.stderr)
        return 1
    distinct = list(dict.fromkeys(revisions))
    for a, b in zip(distinct, distinct[1:]):
        # same-engine proof: only non-engine files may differ between
        # the contributing revisions. "Engine" includes the build
        # configuration — a build.sbt / plugin / JVM-flag change alters
        # the produced engine even with src/main untouched.
        same = subprocess.run(
            ["git", "diff", "--quiet", a, b, "--",
             "src/main", "build.sbt", "project"],
            capture_output=True).returncode
        if same != 0:
            print(f"refusing to merge passes of different ENGINES: revisions "
                  f"{a} and {b} differ under src/main, build.sbt or project/ "
                  f"— re-run at one revision", file=sys.stderr)
            return 1
    merged = {
        "metric": "stress", "mode": base.get("mode"), "copies": base["copies"],
        "base": base["base"], "revision": revisions[0],
        "revisions_per_pass": revisions, "passes": len(passes),
        "shuffle_partitions_per_pass": [p.get("shuffle_partitions") for p in passes],
        "queries": {},
        # run metadata (frontier log, escalation marker) from the NEWEST
        # pass that defines it — older passes may predate the field
        "q45_frontier_sizes": next((p["q45_frontier_sizes"] for p in reversed(passes)
                                    if "q45_frontier_sizes" in p), None),
        "q45_escalated": next((p["q45_escalated"] for p in reversed(passes)
                               if "q45_escalated" in p), None),
        "peak_heap_mb_per_pass": [p.get("peak_heap_mb") for p in passes],
        "notes": ("steady_sec = per-field MEDIAN across same-revision passes "
                  "(min/max alongside); first_sec/build_sec keep the min (one-"
                  "time costs). steady_sec for the dedup family (q42/q45) reads "
                  "session-persisted shingle/pair relations — within each pass, "
                  "only the FIRST dedup probe's first_sec carries the one-time "
                  "relation build; later family members' first runs start warm"),
    }
    # union of query keys: a probe added to the tier mid-round appears in
    # later passes only — merged over the passes that ran it, None elsewhere
    all_queries = [q for p in passes for q in p["queries"]]
    for q in dict.fromkeys(all_queries):
        firsts = [p["queries"][q]["first_sec"] for p in passes if q in p["queries"]]
        steadies = [p["queries"].get(q, {}).get("steady_sec") for p in passes]
        ran = [s for s in steadies if s is not None]
        merged["queries"][q] = {
            "first_sec": min(firsts),
            "steady_sec": median(ran),
            "steady_min_sec": min(ran),
            "steady_max_sec": max(ran),
            "steady_per_pass": steadies,
        }
    for key in SECTIONS:
        sec = merge_section(passes, key)
        if sec is not None:
            merged[key] = sec
    json.dump(merged, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(passes)} passes @ {revisions[0]}, "
          + ", ".join(f"{q}={v['steady_sec']}" for q, v in merged["queries"].items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
