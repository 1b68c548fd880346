#!/usr/bin/env python3
"""Merge N `probeonly` stress passes into a committed tier artifact.

The `batched_probes` section (r19, the q137/q138/q139 shapes at
100/1k/10k queries against the tier's persisted stores) was added
after the committed multi-pass tier campaigns froze, so it runs
standalone (`runMain graft.Stress <copies> probeonly`, one
{"metric":"stress_probe"} line per pass) — the same post-campaign
convention as the other section modes. Each (op, n_queries) point
takes the per-pass MEDIAN second (raw per-pass lists alongside, with
each point's sys% so storm-inflated samples are adjudicable); row
counts must agree across passes (the probes are deterministic).

Usage: python3 tools/merge_probe.py TIER.json PASS1.json [PASS2 ...]
"""
import json
import subprocess
import sys

OPS = ("ivf_probe_all", "bm25_probe_all", "lsh_probe_batch")


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
        if p.get("metric") != "stress_probe":
            print(f"not a probeonly pass: metric={p.get('metric')}", file=sys.stderr)
            return 1
        if (p["copies"], p["base"]) != (tier["copies"], tier["base"]):
            print("refusing a probe pass from a different tier", file=sys.stderr)
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
    merged = {}
    for op in OPS:
        pts = [p[op] for p in passes]
        rows_sets = [[pt["rows"] for pt in ps] for ps in pts]
        if len(set(map(tuple, rows_sets))) != 1:
            print(f"refusing: {op} row counts differ across passes "
                  f"(non-deterministic probe?): {rows_sets}", file=sys.stderr)
            return 1
        merged[op] = [
            {"n_queries": pts[0][i]["n_queries"],
             "sec": median([ps[i]["sec"] for ps in pts]),
             "sec_per_pass": [ps[i]["sec"] for ps in pts],
             "sys_pct_per_pass": [ps[i]["sys_pct"] for ps in pts],
             "rows": pts[0][i]["rows"]}
            for i in range(len(pts[0]))]
    # the r20 skew audit rides the same pass artifact; the per-cell
    # counts are deterministic (same index, same queries), so refuse
    # passes that disagree instead of silently keeping one
    skews = [p.get("ivf_cell_skew") for p in passes]
    if any(s is not None for s in skews):
        if any(s != skews[0] for s in skews[1:]):
            print(f"refusing: ivf_cell_skew differs across passes: {skews}",
                  file=sys.stderr)
            return 1
        merged["ivf_cell_skew"] = skews[0]
    merged["passes"] = len(passes)
    merged["revision"] = revisions[0]
    merged["note"] = ("section added after the tier campaign froze; measured "
                      "standalone (probeonly mode) at the recorded revision")
    tier["batched_probes"] = merged
    for op in OPS:
        print(f"merged {op}: " + ", ".join(
            f"{pt['n_queries']}q={pt['sec']}s" for pt in merged[op]))
    with open(tier_path, "w") as f:
        json.dump(tier, f, indent=1)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
