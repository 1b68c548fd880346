#!/usr/bin/env bash
# Round-20 post-campaign section: batched-probe scaling re-measured at
# every committed tier at the MaxScore-pruned revision (aed8d74+) —
# the r19 rows were frozen at the exhaustive probeAll (bm25 1k-query
# point 96.75 s, 10k infeasible) and carry no ivf_cell_skew audit.
# Pass files land in stress_passes/ for merging + commit.
set -uo pipefail
cd "$(dirname "$0")/.."

CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens=java.base/$p=ALL-UNNAMED"
done

run() { # run <copies> <mode> <outfile>
  echo "=== $(date +%H:%M:%S) Stress $1 $2 -> $3" >&2
  java $AO -Xmx48g -Dspark.sql.session.timeZone=UTC -cp "$CP" \
    graft.Stress "$1" "$2" > "$3.tmp" 2>>/tmp/r20_stress.log \
    && mv "$3.tmp" "$3" || echo "FAILED: $1 $2" >&2
}

mkdir -p stress_passes
for c in 100 30 10 1; do
  for i in 1 2; do
    run "$c" probeonly "stress_passes/sprobe${c}_p$i.json"
  done
done
echo "=== campaign done $(date +%H:%M:%S)" >&2
