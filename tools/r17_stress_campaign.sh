#!/usr/bin/env bash
# Round-17 post-campaign sections: q111 (salted join) re-measurement at
# 100x and the new bm25_stream section at every committed tier.
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
    graft.Stress "$1" "$2" > "$3.tmp" 2>>/tmp/r17_stress.log \
    && mv "$3.tmp" "$3" || echo "FAILED: $1 $2" >&2
}

for i in 1 2 3; do
  run 100 q111only "stress_passes/sq111_100_p$i.json"
done
for c in 1 10 30 100; do
  for i in 1 2 3; do
    run "$c" streamonly "stress_passes/sstream${c}_p$i.json"
  done
done
echo "=== campaign done $(date +%H:%M:%S)" >&2
