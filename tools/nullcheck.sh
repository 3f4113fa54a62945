#!/bin/bash
# NULL-robustness gate: clone sf0.01, inject NULL text/lang/source
# rows into documents (disjoint id classes), and run the full DuckDB
# compare against the modified data. The operators treat NULL strata /
# NULL text as first-class ("NULL text = empty document"), and the
# driver has regenerated testdata schemas before — this catches the
# Spark-vs-DuckDB null-semantics divergences (concat_ws vs
# array_to_string, = vs IS NOT DISTINCT FROM, NULLS FIRST vs LAST)
# before a data change surfaces them as confusing hash mismatches.
set -e
cd /root/repo
SRC=${1:-/root/testdata/sf0.01}
DIR=${2:-/tmp/sf_nullcheck}
OUT=${3:-/tmp/verify_nullcheck}
mkdir -p "$DIR"
python3 - "$SRC" "$DIR" <<'EOF'
import duckdb, shutil, sys
src, dst = sys.argv[1], sys.argv[2]
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","embeddings"]:
    shutil.copyfile(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT doc_id,
    CASE WHEN doc_id % 100 = 7 THEN NULL ELSE text END AS text,
    CASE WHEN doc_id % 100 = 13 THEN NULL ELSE lang END AS lang,
    CASE WHEN doc_id % 100 = 23 THEN NULL ELSE source END AS source,
    n_chars
  FROM read_parquet('{src}/documents.parquet')
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"""SELECT count(*) FILTER (WHERE text IS NULL),
  count(*) FILTER (WHERE lang IS NULL),
  count(*) FILTER (WHERE source IS NULL)
  FROM read_parquet('{dst}/documents.parquet')""").fetchone()
print(f"injected NULLs text/lang/source: {n}")
EOF
exec bash tools/verify.sh "$DIR" "$OUT"
