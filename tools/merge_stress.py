#!/usr/bin/env python3
"""Merge N heavy-tier stress passes into one committed artifact.

The 100x tier runs minutes per probe on a shared-host VM whose
throughput swings pass-to-pass far beyond the documented 15-30% noise
(observed: identical deterministic probes 1.2-4x apart between two
back-to-back passes). A single pass is therefore not a measurement;
the committed artifact takes the per-query MIN across passes (the
standard floor-of-noise estimator the 1x/10x/30x tiers get from their
min-of-two repeats) and keeps every pass's raw steady time alongside
so the variance itself stays visible.

Usage: python3 tools/merge_stress.py OUT PASS1.json PASS2.json [...]
"""
import json
import sys


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
    merged = {
        "metric": "stress", "mode": base.get("mode"), "copies": base["copies"],
        "base": base["base"], "passes": len(passes),
        "shuffle_partitions_per_pass": [p.get("shuffle_partitions") for p in passes],
        "queries": {},
        # run metadata (frontier log, escalation marker) from the NEWEST
        # pass that defines it — older passes may predate the field
        "q45_frontier_sizes": next((p["q45_frontier_sizes"] for p in reversed(passes)
                                    if "q45_frontier_sizes" in p), None),
        "q45_escalated": next((p["q45_escalated"] for p in reversed(passes)
                               if "q45_escalated" in p), None),
        "peak_heap_mb_per_pass": [p.get("peak_heap_mb") for p in passes],
    }
    # union of query keys: a probe added to the tier mid-round appears in
    # later passes only — min over the passes that ran it, None elsewhere
    all_queries = [q for p in passes for q in p["queries"]]
    for q in dict.fromkeys(all_queries):
        firsts = [p["queries"][q]["first_sec"] for p in passes if q in p["queries"]]
        steadies = [p["queries"].get(q, {}).get("steady_sec") for p in passes]
        merged["queries"][q] = {
            "first_sec": min(firsts),
            "steady_sec": min(s for s in steadies if s is not None),
            "steady_per_pass": steadies,
        }
    for key in ("semantic_dedup", "semantic_dedup_hier"):
        sem = [p[key] for p in passes if key in p]
        if sem:
            # same estimator as the queries map: each timing field is the
            # min across passes independently (recall/rows are
            # deterministic per code version — any pass's copy is fine)
            merged[key] = dict(
                min(sem, key=lambda s: s["steady_sec"]),
                first_sec=min(s["first_sec"] for s in sem),
                steady_sec=min(s["steady_sec"] for s in sem),
                steady_per_pass=[p.get(key, {}).get("steady_sec") for p in passes])
    json.dump(merged, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(passes)} passes, "
          + ", ".join(f"{q}={v['steady_sec']}" for q, v in merged["queries"].items()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
