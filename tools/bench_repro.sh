#!/usr/bin/env bash
# Canonical bench invocation — run THIS on any host (builder or driver)
# so two BENCH artifacts of the same HEAD differ only in host load,
# never in JVM flags, heap, parallelism, or repeat protocol.
#
#   tools/bench_repro.sh [SF_DIR]          # default /root/testdata/sf0.1
#
# Emits the compact bench JSON line on stdout (same contract as the
# driver's capture) and writes:
#   BENCH_LOCAL.json        full-precision per-query map (Bench itself)
#   BENCH_ENV.json          host snapshot taken immediately before the run
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens=java.base/$p=ALL-UNNAMED"
done

# Host snapshot BEFORE the run — free memory, load, JVM, revision —
# so a disputed number can be adjudicated from committed artifacts.
AVAIL_KB=$(awk '/MemAvailable:/{print $2}' /proc/meminfo)
cat > BENCH_ENV.json <<EOF
{"git_rev":"$(git rev-parse --short HEAD 2>/dev/null || echo unknown)",
 "sf_dir":"$SF_DIR",
 "avail_gb":$(awk "BEGIN{printf \"%.1f\", $AVAIL_KB/1048576}"),
 "load":"$(cut -d' ' -f1-3 /proc/loadavg)",
 "nproc":$(nproc),
 "java":"$(java -version 2>&1 | head -1 | sed 's/"/\\\\"/g')",
 "parent_flags":"-Xmx2g (parent times nothing; children pinned by SPARK_GRAFT_BENCH_CHILD_HEAP)",
 "child_heap":"${SPARK_GRAFT_BENCH_CHILD_HEAP:-8g}",
 "batch":${SPARK_GRAFT_BENCH_BATCH:-1},
 "repeats":${SPARK_GRAFT_BENCH_REPEATS:-3},
 "cpus":"${SPARK_GRAFT_CPUS:-4}"}
EOF

# The parent JVM only forks children and merges JSON — a small fixed
# heap keeps it from competing with the measured children for memory.
SPARK_GRAFT_SF_DIR="$SF_DIR" \
exec java $AO -Xmx2g -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench
