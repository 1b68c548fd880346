#!/usr/bin/env python3
"""Merge N `compactonly` stress passes into a committed tier artifact.

The `index_compaction` section (r19, q135's claim at tier scale: 120
maintenance batches under the production graft.ivfCompactShards=64
keep live shards bounded and probe latency flat, vs a never-compacting
control) was added after the committed multi-pass tier campaigns
froze, so it runs standalone (`runMain graft.Stress <copies>
compactonly`, one {"metric":"stress_compact"} line per pass) — the
same post-campaign convention as the other section modes. Probe
latencies take the per-sample MEDIAN across passes (each pass's raw
trajectory kept verbatim, with its per-probe sys% so storm-inflated
samples are adjudicable); live-shard trajectories must be identical
across passes (they are deterministic) and are kept once.

Usage: python3 tools/merge_compact.py TIER.json PASS1.json [PASS2 ...]
"""
import json
import subprocess
import sys


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
        if p.get("metric") != "stress_compact":
            print(f"not a compactonly pass: metric={p.get('metric')}", file=sys.stderr)
            return 1
        if (p["copies"], p["base"]) != (tier["copies"], tier["base"]):
            print("refusing a compact pass from a different tier", file=sys.stderr)
            return 1
        if not p.get("match"):
            print("refusing a pass whose compacted store diverged from its "
                  "control", file=sys.stderr)
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
    base = dict(passes[0])
    for arm in ("prod", "control"):
        # live-shard trajectories are deterministic: same engine, same
        # tier, same batch schedule -> identical across passes. A
        # mismatch means the passes are not measuring the same thing,
        # so refuse instead of silently keeping pass 1's copy.
        shard_lists = [p[arm]["live_shards"] for p in passes]
        if any(sl != shard_lists[0] for sl in shard_lists[1:]):
            print(f"refusing: {arm} live_shards trajectories differ across "
                  f"passes (not the same deterministic run)", file=sys.stderr)
            return 1
        probe_lists = [p[arm]["probe_secs"] for p in passes]
        if len(set(len(pl) for pl in probe_lists)) != 1:
            print(f"refusing: {arm} probe_secs lengths differ across passes "
                  f"({[len(pl) for pl in probe_lists]}) — a truncated pass "
                  f"would silently shorten the median trajectory",
                  file=sys.stderr)
            return 1
        base[arm]["probe_secs"] = [
            median([pl[i] for pl in probe_lists])
            for i in range(min(len(pl) for pl in probe_lists))]
        base[arm]["probe_secs_per_pass"] = probe_lists
        base[arm]["probe_sys_pct_per_pass"] = [
            p[arm].get("probe_sys_pct") for p in passes]
        base[arm]["batch_secs_per_pass"] = [p[arm]["batch_secs"] for p in passes]
        del base[arm]["batch_secs"]
        base[arm].pop("probe_sys_pct", None)
    base["passes"] = len(passes)
    base["revision"] = revisions[0]
    base["note"] = ("section added after the tier campaign froze; measured "
                    "standalone (compactonly mode) at the recorded revision")
    tier["index_compaction"] = base
    print(f"merged {len(passes)} compact passes into {tier_path}: "
          f"prod probes={base['prod']['probe_secs']} "
          f"control probes={base['control']['probe_secs']}")
    with open(tier_path, "w") as f:
        json.dump(tier, f, indent=1)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
