#!/bin/bash
# NULL- and Unicode-robustness gate: clone sf0.01, inject NULL
# text/lang/source rows AND multibyte text (sharp-s, Greek sigma, CJK,
# emoji, combining marks, RTL) into documents (disjoint id classes),
# then run the full DuckDB compare against the modified data. The
# operators treat NULL strata / NULL text as first-class ("NULL text =
# empty document"), and the driver has regenerated testdata schemas
# before — this catches Spark-vs-DuckDB null-semantics divergences
# (concat_ws vs array_to_string, = vs IS NOT DISTINCT FROM, NULLS
# FIRST vs LAST) and multibyte regressions before a data change
# surfaces them as confusing hash mismatches.
#
# Known, deliberate exclusions — codepoints where the JVM's FULL
# Unicode case mapping (the engine's definition of lower-casing, see
# TextAnalysis) differs from DuckDB's simple mapping, so they would
# fail the cross-engine compare by design and are not injected:
#   - Turkish dotted capital I (U+0130): JVM 'i'+U+0307, DuckDB 'i'.
#   - Greek word-FINAL capital sigma: JVM context-sensitively lowers
#     to final form 'ς' (U+03C2), DuckDB to 'σ' everywhere.
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
          "lineitem"]:
    shutil.copyfile(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')
con = duckdb.connect()
con.execute(f"""
COPY (
  SELECT doc_id,
    CASE WHEN doc_id % 100 = 7 THEN NULL
      WHEN doc_id % 100 = 17 THEN text || ' STRASSE ß GROSS'
      WHEN doc_id % 100 = 29 THEN text || ' ΕΛΛΗΝΙΚΆ ΑΘΉΝΑ'
      WHEN doc_id % 100 = 31 THEN text || ' 机器学习与数据处理'
      WHEN doc_id % 100 = 43 THEN text || ' 🚀🔥 café café'
      WHEN doc_id % 100 = 53 THEN text || ' مرحبا שלום'
      ELSE text END AS text,
    CASE WHEN doc_id % 100 = 13 THEN NULL ELSE lang END AS lang,
    CASE WHEN doc_id % 100 = 23 THEN NULL ELSE source END AS source,
    n_chars
  FROM read_parquet('{src}/documents.parquet')
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT event_id, ts,
    CASE WHEN event_id % 1000 = 7 THEN NULL ELSE user_id END AS user_id,
    CASE WHEN event_id % 1000 = 13 THEN NULL ELSE event_type END AS event_type,
    value,
    CASE WHEN event_id % 1000 = 23 THEN NULL
      WHEN event_id % 1000 = 107 THEN '{{bad json'
      WHEN event_id % 1000 = 113 THEN '{{"k": "str-not-int"}}'
      WHEN event_id % 1000 = 123 THEN '{{"k": {{"nested": 1}}}}'
      WHEN event_id % 1000 = 131 THEN '{{"k": null}}'
      WHEN event_id % 1000 = 143 THEN '{{"k": 1, "k": 2}}'
      WHEN event_id % 1000 = 153 THEN '{{"κλειδί": 5}}'
      ELSE props END AS props
  FROM read_parquet('{src}/events.parquet')
) TO '{dst}/events.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (
  SELECT vec_id,
    CASE WHEN vec_id % 200 = 7 THEN NULL ELSE embedding END AS embedding,
    label
  FROM read_parquet('{src}/embeddings.parquet')
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"""SELECT count(*) FILTER (WHERE text IS NULL),
  count(*) FILTER (WHERE lang IS NULL),
  count(*) FILTER (WHERE source IS NULL)
  FROM read_parquet('{dst}/documents.parquet')""").fetchone()
print(f"injected NULLs text/lang/source: {n}")
EOF
exec bash tools/verify.sh "$DIR" "$OUT"
