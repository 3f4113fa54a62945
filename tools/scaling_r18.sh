#!/bin/bash
# sf1 scaling evidence (r18, VERDICT r17 #8): heavy families at the
# derived sf1 (/tmp/sf1d, 10x sf0.1 — tools/derive_sf1.scala) at TWO
# core counts, isolated JVM per (query, cpus), reps median. Writes
# docs/scaling_r18.json. Usage: tools/scaling_r18.sh [reps]
set -e
cd /root/repo
REPS="${1:-3}"
SF=/tmp/sf1d
JAR=$(ls target/scala-2.13/*.jar | head -1)
ADDOPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
QUERIES="q_text_bm25 q_text_bm25_staged q_text_bm25_deleted q_ann_takedown_audit q_graph_pagerank q_dsir_weights q_bpe_train q_minhash_neardup q_sim_ann_ivf_staged"
OUT=docs/scaling_r18.json
TMP=$(mktemp)
echo "{" > "$TMP"
first=1
for CPUS in 32 8; do
  for Q in $QUERIES; do
    V=$(SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
        SPARK_GRAFT_REPS="$REPS" SPARK_GRAFT_ONLY="$Q" \
        SPARK_GRAFT_BENCH_FILE=/tmp/scaling_sidecar.json \
        java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC -cp "$JAR:/opt/spark/jars/*" \
        graft.Bench 2>/dev/null \
        | python3 -c "import json,sys; print(json.loads(sys.stdin.read().strip().splitlines()[0])['queries']['$Q'])")
    [ $first -eq 0 ] && echo "," >> "$TMP"
    first=0
    printf '  "%s_c%s": %s' "$Q" "$CPUS" "$V" >> "$TMP"
    echo "[scaling] $Q cpus=$CPUS -> $V s" >&2
  done
done
printf '\n}\n' >> "$TMP"
mv "$TMP" "$OUT"
echo "[scaling] wrote $OUT" >&2
