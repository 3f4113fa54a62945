#!/usr/bin/env python3
"""Out-of-SQL oracle for q_dedup_clusters at derived scale.

The registered DuckDB oracle closes the jaccard near-dup pairs with a
recursive transitive-closure CTE — correct, and fine at the sf0.01
gate, but it materializes EVERY reachable (s, t) pair: the derived
sf1 corpus (tools/derive_sf1.scala) manufactures a ~36k-doc giant
near-dup component, so the closure would hold ~1.3e9 rows and no SQL
engine finishes it. Same pair set, different closure: this script
re-derives the pairs in DuckDB (the block-banded inter join — the
exact SQL the registered oracle uses) and closes them with union-find
in O(E α(N)), then compares (doc, root) sets exactly against the
Spark output.

Usage: tools/check_clusters.py <sf_dir> <verify_out_dir>
"""
import sys
import duckdb
import pandas as pd

THRESHOLD, GAP, DF_CAP_PCT = 0.8, 25, 77


def main(sf_dir, out_dir):
    con = duckdb.connect()
    docs = f"{sf_dir}/documents.parquet"
    import os
    if os.path.isdir(docs):
        docs = f"{docs}/*.parquet"
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs}')")
    con.execute(f"""
CREATE TEMP TABLE tok AS
WITH tok0 AS (
  SELECT DISTINCT doc, token FROM (
    SELECT doc_id AS doc, unnest(string_split(lower(text), ' ')) AS token
    FROM documents) raw),
hot AS (SELECT token FROM tok0 GROUP BY token
        HAVING count(*) * 100 > {DF_CAP_PCT} *
          (SELECT count(DISTINCT doc) FROM tok0))
SELECT * FROM tok0 WHERE token NOT IN (SELECT token FROM hot)""")
    pairs = con.execute(f"""
WITH sizes AS (SELECT doc, count(*) AS n FROM tok GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS i
  FROM (SELECT doc, token, doc // {GAP} AS blk FROM tok
        UNION ALL SELECT doc, token, doc // {GAP} + 1 AS blk FROM tok) a
  JOIN (SELECT doc, token, doc // {GAP} AS blk FROM tok) b
    ON a.token = b.token AND a.blk = b.blk
    AND a.doc < b.doc AND b.doc - a.doc <= {GAP}
  GROUP BY 1, 2)
SELECT doc_a, doc_b FROM inter
JOIN sizes na ON na.doc = doc_a JOIN sizes nb ON nb.doc = doc_b
WHERE floor((CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE))
  * 10000.0 + 0.5) / 10000.0 >= {THRESHOLD}""").fetchall()

    par = {}

    def find(x):
        r = x
        while par.get(r, r) != r:
            r = par[r]
        while par.get(x, x) != x:
            par[x], x = r, par[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[max(ra, rb)] = min(ra, rb)
    nodes = set(x for p in pairs for x in p)
    expect = {(d, find(d)) for d in nodes}
    got_df = pd.read_parquet(f"{out_dir}/q_dedup_clusters")
    got = set(zip(got_df["doc"].astype(int), got_df["root"].astype(int)))
    if got == expect:
        print(f"OK q_dedup_clusters rows={len(got)} "
              f"(pairs={len(pairs)}, union-find closure)")
    else:
        print(f"!! q_dedup_clusters MISMATCH expect={len(expect)} "
              f"got={len(got)}")
        print("   missing in spark:", sorted(expect - got)[:5])
        print("   extra in spark:  ", sorted(got - expect)[:5])
        sys.exit(1)


main(sys.argv[1], sys.argv[2])
