#!/bin/bash
# Same-window A/B: for each query, run the BEFORE jar then the AFTER
# jar back-to-back (one isolated JVM per run, reps median) — the only
# protocol this box's ±30-50% day-to-day noise respects (docs/SCALE.md).
# Usage: tools/ab_iso.sh <before_jar> <after_jar> <sf_dir> <reps> <q...>
set -e
BEFORE="$1"; AFTER="$2"; SF="$3"; REPS="$4"; shift 4
ADDOPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
run_one() { # jar query
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS="$REPS" \
  SPARK_GRAFT_ONLY="$2" SPARK_GRAFT_BENCH_FILE=/tmp/ab_sidecar.json \
    java $ADDOPENS -Xmx48g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$1:/opt/spark/jars/*" \
    graft.Bench 2>/dev/null \
    | python3 -c "import json,sys; d=json.loads(sys.stdin.read().strip().splitlines()[0]); print(d['queries']['$2'])"
}
for Q in "$@"; do
  # interleave B A B A: a box-load drift during the window shows up as
  # disagreement between the two pairs instead of silently biasing one side
  B1=$(run_one "$BEFORE" "$Q"); A1=$(run_one "$AFTER" "$Q")
  B2=$(run_one "$BEFORE" "$Q"); A2=$(run_one "$AFTER" "$Q")
  B="$B1" A="$A1" BB="$B2" AA="$A2" Q="$Q" python3 - <<'PYEOF'
import os
b1=float(os.environ["B"]); a1=float(os.environ["A"])
b2=float(os.environ["BB"]); a2=float(os.environ["AA"])
bm=min(b1,b2); am=min(a1,a2)
print(f'{os.environ["Q"]} before={b1:.2f},{b2:.2f} after={a1:.2f},{a2:.2f} best-ratio={am/bm:.2f}')
PYEOF
done
