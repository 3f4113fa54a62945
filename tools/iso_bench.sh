#!/bin/bash
# Isolated-JVM bench: one JVM per (query, scale dir), the only
# protocol whose per-query numbers mean anything on this box (a
# multi-query sweep in one JVM inflates late queries via accumulated
# memory pressure — docs/SCALE.md "Measured 10x scaling" protocol
# note). Usage:
#   tools/iso_bench.sh <sf_dir> <reps> <query1> [query2 ...]
# Prints one line per query:  <query> <median_seconds>
set -e
cd /root/repo
SF="$1"; REPS="$2"; shift 2
JAR=$(ls target/scala-2.13/*.jar | head -1)
ADDOPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
for Q in "$@"; do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS="$REPS" \
  SPARK_GRAFT_ONLY="$Q" \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$JAR:/opt/spark/jars/*" \
    graft.Bench 2>/dev/null \
    | python3 -c "import json,sys; lines=[l for l in sys.stdin.read().strip().splitlines() if '\"queries\"' in l]; d=json.loads(lines[0]); print('$Q', d['queries']['$Q'])"
done
