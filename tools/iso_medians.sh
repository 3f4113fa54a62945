#!/bin/bash
# BENCH-adjacent isolated-medians artifact: per-round, rerun the
# sweep's top-N heaviest queries one-JVM-per-query (the
# tools/iso_bench.sh protocol — the only protocol whose per-query
# numbers mean anything on this box; a 132-query sweep in one JVM
# inflates late queries via accumulated memory pressure, the
# docs/SCALE.md "Measured 10x scaling" note) and check the medians in
# next to the sweep, so cross-round per-query comparison stops needing
# a reproduction exercise.
# Usage:
#   tools/iso_medians.sh <prior_bench_json> <sf_dir> <reps> <topN> <out_json>
# <prior_bench_json> is the PRIOR round's driver sweep artifact
# (BENCH_r{N-1}.json) — the current round's sweep lands only after the
# build, so the selection of "heaviest" comes from the last sweep and
# the MEDIANS are measured at HEAD.
set -e
cd /root/repo
BENCH="$1"; SF="$2"; REPS="$3"; TOPN="$4"; OUT="$5"

QUERIES=$(python3 - "$BENCH" "$TOPN" << 'EOF'
import json, re, sys
d = json.load(open(sys.argv[1]))
# prefer a structured per-query field when the artifact has one (the
# bench's own JSON line, or a driver artifact whose "parsed" survived)
qs = {}
parsed = d.get("parsed") if isinstance(d.get("parsed"), dict) else None
struct = (d.get("queries") if isinstance(d.get("queries"), dict)
          else (parsed or {}).get("queries"))
if isinstance(struct, dict):
    qs = {k: float(v) for k, v in struct.items()
          if isinstance(v, (int, float)) and v >= 0}
else:
    # fall back to regex over the driver's "tail" string, which may be
    # truncated MID-LINE: a cut trailing value (`"q_x":12.` from 12.84,
    # or `:1` from :17.6) still matches the number pattern. A value is
    # only suspect when its match runs to the very END of the stripped
    # tail (nothing terminated it) — a tail that merely ends with
    # shutdown/log noise after a complete JSON line keeps every pair.
    src = d["tail"] if "tail" in d else json.dumps(d)
    stripped = src.rstrip()
    matches = list(re.finditer(r'"(q[a-z0-9_]*)":([0-9][0-9.]*)',
                               stripped))
    if matches and matches[-1].end() == len(stripped):
        matches = matches[:-1]
    for m in matches:
        qs[m.group(1)] = float(m.group(2))
top = sorted(qs.items(), key=lambda kv: -kv[1])[: int(sys.argv[2])]
print(" ".join(k for k, _ in top))
EOF
)
echo "top-$TOPN of $BENCH: $QUERIES" >&2

RESULTS=$(tools/iso_bench.sh "$SF" "$REPS" $QUERIES)
echo "$RESULTS" >&2

python3 - "$BENCH" "$SF" "$REPS" "$OUT" << EOF
import json, sys
lines = """$RESULTS""".strip().splitlines()
queries = {}
for ln in lines:
    name, sec = ln.split()
    queries[name] = float(sec)
out = {
    "metric": "isolated_median_seconds",
    "protocol": "one JVM per query, tools/iso_bench.sh, median of reps",
    "noise_note": ("this box carries external load spikes (observed "
                   "per-rep spread up to 3x on an idle-looking "
                   "machine, e.g. q_graph_pagerank reps "
                   "[17.6,25.1,12.8,17.6,7.5] vs a 3.9s quiet-window "
                   "median in r10) - compare medians across rounds "
                   "only against the spread, never a single number"),
    "source_bench": sys.argv[1],
    "sf_dir": sys.argv[2],
    "reps": int(sys.argv[3]),
    "queries": queries,
}
with open(sys.argv[4], "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print("wrote", sys.argv[4])
EOF
