#!/bin/bash
# Probe-only serving latency (graft.ServingBench): stage the retrieval
# tables once, time the probes alone — the build/probe split the sweep's
# fused table-tense numbers deliberately don't give. Usage:
#   tools/serving_bench.sh [sf_dir] [reps]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.1}
REPS=${2:-5}
JAR=$(ls target/scala-2.13/*.jar | head -1)
ADDOPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS="$REPS" \
  java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$JAR:/opt/spark/jars/*" \
  graft.ServingBench
